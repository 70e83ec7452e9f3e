"""Round-trip tests for Keras-h5 export, dataset writing, and the CLI."""

import numpy as np
import jax
import pytest

jax = pytest.importorskip("jax")


def test_keras_h5_roundtrip(tmp_path):
    from tpu21cmvae.models.io_keras import load_keras_mlp, save_keras_mlp
    from tpu21cmvae.ops.mlp import init_mlp, mlp_sizes

    params = init_mlp(jax.random.key(0), (7, 24, 16, 451))
    path = str(tmp_path / "m.h5")
    save_keras_mlp(path, params)
    back = load_keras_mlp(path)
    assert mlp_sizes(back) == (7, 24, 16, 451)
    for a, b in zip(params, back):
        np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))
        np.testing.assert_array_equal(np.asarray(a["b"]), np.asarray(b["b"]))


def test_keras_h5_matches_reference_layout(tmp_path):
    """The written file must carry the same structural markers our reader
    relies on in the reference's shipped files."""
    import h5py

    from tpu21cmvae.models.io_keras import save_keras_mlp
    from tpu21cmvae.ops.mlp import init_mlp

    path = str(tmp_path / "m.h5")
    save_keras_mlp(path, init_mlp(jax.random.key(1), (4, 8, 3)))
    from tpu21cmvae.models.io_keras import _decode

    with h5py.File(path) as f:
        g = f["model_weights"]
        # input layer listed first with no weights, as in the artifacts
        assert _decode(g.attrs["layer_names"]) == ["input", "dense", "dense_1"]
        assert _decode(g["dense"].attrs["weight_names"]) == [
            "dense/kernel:0",
            "dense/bias:0",
        ]
        assert g["dense"]["dense"]["kernel:0"].shape == (4, 8)


def test_dataset_save_load_roundtrip(tmp_path, splits):
    from tpu21cmvae.data.dataset import load_dataset, save_dataset

    path = str(tmp_path / "ds.h5")
    save_dataset(splits, path)
    back = load_dataset(path)
    for a, b in zip(splits, back):
        np.testing.assert_array_equal(a, b)


def test_default_cache_path_env(monkeypatch, tmp_path):
    from tpu21cmvae.data.dataset import default_cache_path

    monkeypatch.setenv("TPU21CMVAE_CACHE", str(tmp_path))
    assert default_cache_path() == str(tmp_path / "dataset_21cmVAE.h5")


def test_cli_train_evaluate_predict(tmp_path, splits, capsys):
    from tpu21cmvae.__main__ import main
    from tpu21cmvae.data.dataset import save_dataset

    ds = str(tmp_path / "ds.h5")
    save_dataset(splits, ds)
    model = str(tmp_path / "model.npz")

    main(["train", "direct", "--dataset", ds, "--epochs", "3", "--out", model])
    out = capsys.readouterr().out
    assert "test error" in out and "saved" in out

    main(["evaluate", model, "--dataset", ds])
    out = capsys.readouterr().out
    assert "relative" in out and "absolute" in out

    params_file = str(tmp_path / "p.npy")
    np.save(params_file, np.asarray(splits.par_test[:5], np.float32))
    sig_file = str(tmp_path / "s.npy")
    main(["predict", model, params_file, "--out", sig_file])
    sigs = np.load(sig_file)
    assert sigs.shape == (5, splits.n_bins)


def test_cli_tune(tmp_path, splits, capsys):
    from tpu21cmvae.__main__ import main
    from tpu21cmvae.data.dataset import save_dataset

    ds = str(tmp_path / "ds.h5")
    save_dataset(splits, ds)
    main(["tune", "--dataset", ds, "--trials", "1"])
    assert "val_err" in capsys.readouterr().out


def test_cli_tune_vae_and_halving(tmp_path, splits, capsys, monkeypatch):
    """The tune verb exposes every family and the SHA mode; patch the
    heavy search functions to keep the smoke test fast while pinning the
    dispatch table + argument wiring."""
    from tpu21cmvae import tuner
    from tpu21cmvae.__main__ import main
    from tpu21cmvae.data.dataset import save_dataset

    ds = str(tmp_path / "ds.h5")
    save_dataset(splits, ds)
    calls = []

    def fake(name):
        def run(data, verbose=False, **kw):
            calls.append((name, kw))
            cfg = tuner.DirectEmulatorConfig(hidden_dims=(16,))
            return tuner.TuneResult([tuner.Trial(cfg, 1.0, 1.0, 2, 0.1, 9)])

        return run

    for fn in ("tune_direct", "tune_autoencoder", "tune_vae",
               "tune_direct_halving", "tune_autoencoder_halving",
               "tune_vae_halving"):
        monkeypatch.setattr(tuner, fn, fake(fn))

    main(["tune", "--family", "vae", "--dataset", ds, "--trials", "2"])
    main(["tune", "--family", "vae", "--halving", "--dataset", ds,
          "--trials", "4"])
    main(["tune", "--family", "direct", "--halving", "--dataset", ds,
          "--trials", "4"])
    main(["tune", "--family", "ae", "--halving", "--dataset", ds,
          "--trials", "4"])
    assert [c[0] for c in calls] == [
        "tune_vae", "tune_vae_halving", "tune_direct_halving",
        "tune_autoencoder_halving",
    ]
    assert calls[0][1]["n_trials"] == 2
    assert calls[1][1]["n_initial"] == 4
    assert "val_err" in capsys.readouterr().out


REF_AE_EMULATOR = (
    "/root/reference/VeryAccurateEmulator/models/"
    "autoencoder_based_emulator/ae_emulator.h5"
)


def test_export_h5_full_model_schema(tmp_path, splits):
    """The exported file carries the full-model attrs
    (model_config/training_config/backend/keras_version) structurally
    matching the reference's shipped artifact schema, so
    tf.keras.models.load_model consumes it without a hand-built
    Sequential (reference load path ``emulator.py:319-337``)."""
    import json
    import os

    import h5py
    import jax

    from tpu21cmvae.models.io_keras import save_keras_mlp
    from tpu21cmvae.ops.mlp import init_mlp

    params = init_mlp(jax.random.key(0), (7, 24, 16, 451))
    path = str(tmp_path / "m.h5")
    save_keras_mlp(path, params, activation="relu", name="Emulator")

    with h5py.File(path, "r") as f:
        got_attrs = set(f.attrs)
        mc = json.loads(f.attrs["model_config"])
        tc = json.loads(f.attrs["training_config"])
        weight_layers = set(f["model_weights"].keys())

    if os.path.exists(REF_AE_EMULATOR):  # schema parity vs the artifact
        with h5py.File(REF_AE_EMULATOR, "r") as f:
            ref_attrs = set(f.attrs)
            ref_mc = json.loads(f.attrs["model_config"])
            ref_tc = json.loads(f.attrs["training_config"])
        # same root attr set minus optimizer state (we export inference
        # models; the artifact carries Adam slots too)
        assert got_attrs == ref_attrs
        assert mc["class_name"] == ref_mc["class_name"] == "Functional"
        assert set(mc["config"]) == set(ref_mc["config"])
        dense = mc["config"]["layers"][1]
        ref_dense = ref_mc["config"]["layers"][1]
        assert set(dense["config"]) == set(ref_dense["config"])
        assert set(tc) == set(ref_tc)
        assert set(tc["optimizer_config"]["config"]) == set(
            ref_tc["optimizer_config"]["config"]
        )

    # architecture facts
    layers = mc["config"]["layers"]
    assert [ly["class_name"] for ly in layers] == [
        "InputLayer", "Dense", "Dense", "Dense"
    ]
    assert layers[0]["config"]["batch_input_shape"] == [None, 7]
    assert [ly["config"]["units"] for ly in layers[1:]] == [24, 16, 451]
    assert [ly["config"]["activation"] for ly in layers[1:]] == [
        "relu", "relu", "linear"
    ]
    assert weight_layers == {"input", "dense", "dense_1", "dense_2"}


def test_export_h5_loads_in_tf_keras(tmp_path, splits):
    """End-to-end interop: tf.keras.models.load_model on our export
    reproduces our forward pass."""
    tf = pytest.importorskip("tensorflow")

    import jax

    from tpu21cmvae.models.io_keras import save_keras_mlp
    from tpu21cmvae.ops.mlp import init_mlp, mlp_apply

    params = init_mlp(jax.random.key(3), (7, 32, 451))
    path = str(tmp_path / "m.h5")
    save_keras_mlp(path, params, activation="relu")

    model = tf.keras.models.load_model(path, compile=False)
    x = np.asarray(splits.par_test[:8], np.float32)
    got = np.asarray(model.predict(x, verbose=0))
    want = np.asarray(mlp_apply(params, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_load_model_dispatches_all_families(tmp_path, splits):
    from tpu21cmvae.models import load_model
    from tpu21cmvae.models.autoencoder import AutoEncoderEmulator
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.models.vae import VAEEmulator
    from tpu21cmvae.utils.config import (
        AutoEncoderConfig,
        DirectEmulatorConfig,
        VAEConfig,
    )

    small = dict(latent_dim=4, enc_hidden_dims=(16,), dec_hidden_dims=(16,),
                 em_hidden_dims=(12,))
    models = [
        DirectEmulator(splits, config=DirectEmulatorConfig(hidden_dims=(16,))),
        AutoEncoderEmulator(splits, config=AutoEncoderConfig(**small)),
        VAEEmulator(splits, config=VAEConfig(**small)),
    ]
    for i, m in enumerate(models):
        p = str(tmp_path / f"m{i}.npz")
        m.save(p)
        back = load_model(p)
        assert type(back) is type(m)
        np.testing.assert_allclose(
            back.predict(splits.par_test[:3]), m.predict(splits.par_test[:3]),
            rtol=1e-5, atol=1e-4,
        )


def test_cli_export_h5(tmp_path, splits, capsys):
    from tpu21cmvae.__main__ import main
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.models.io_keras import load_keras_mlp
    from tpu21cmvae.ops.mlp import mlp_sizes
    from tpu21cmvae.utils.config import DirectEmulatorConfig

    model = DirectEmulator(splits, config=DirectEmulatorConfig(hidden_dims=(16,)))
    ckpt = str(tmp_path / "m.npz")
    model.save(ckpt)
    out = str(tmp_path / "m.h5")
    main(["export-h5", ckpt, "--out", out])
    assert "wrote" in capsys.readouterr().out
    back = load_keras_mlp(out)
    assert mlp_sizes(back) == (7, 16, splits.n_bins)

    # two-stage family exports one file per stage MLP
    from tpu21cmvae.models.autoencoder import AutoEncoderEmulator
    from tpu21cmvae.utils.config import AutoEncoderConfig

    ae = AutoEncoderEmulator(
        splits,
        config=AutoEncoderConfig(latent_dim=4, enc_hidden_dims=(16,),
                                 dec_hidden_dims=(16,), em_hidden_dims=(12,)),
    )
    ckpt = str(tmp_path / "ae.npz")
    ae.save(ckpt)
    main(["export-h5", ckpt, "--out", str(tmp_path / "ae.h5")])
    for stage, sizes in (("em", (7, 12, 4)), ("enc", (451, 16, 4)),
                         ("dec", (4, 16, 451))):
        back = load_keras_mlp(str(tmp_path / f"ae_{stage}.h5"))
        assert mlp_sizes(back) == sizes


def test_keras_loader_natural_order_fallback(tmp_path):
    """Without a layer_names attribute, layers must load in natural
    (dense, dense_2, ..., dense_10) order, not lexicographic."""
    import h5py

    from tpu21cmvae.models.io_keras import load_keras_mlp
    from tpu21cmvae.ops.mlp import init_mlp, mlp_sizes

    sizes = tuple([3] + [4] * 10 + [2])  # 11 layers → dense_10 exists
    params = init_mlp(jax.random.key(0), sizes)
    path = str(tmp_path / "noattr.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        for i, layer in enumerate(params):
            lname = "dense" if i == 0 else f"dense_{i}"
            lg = g.create_group(lname).create_group(lname)
            lg.create_dataset("kernel:0", data=np.asarray(layer["w"]))
            lg.create_dataset("bias:0", data=np.asarray(layer["b"]))
            g[lname].attrs["weight_names"] = [
                f"{lname}/kernel:0".encode(), f"{lname}/bias:0".encode(),
            ]
        # NOTE: no layer_names attribute
    back = load_keras_mlp(path)
    assert mlp_sizes(back) == sizes
    for a, b in zip(params, back):
        np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))


def test_checkpoint_rejects_structure_mismatch(tmp_path):
    import pytest

    from tpu21cmvae.models.checkpoint import load_checkpoint, save_checkpoint

    path = str(tmp_path / "c.npz")
    save_checkpoint(path, {"a": np.ones(3), "b": np.zeros(3)})
    # same leaf count, different structure (keys) → must fail loudly
    with pytest.raises(ValueError, match="structure"):
        load_checkpoint(path, like={"x": np.ones(3), "y": np.zeros(3)})


def test_history_to_jsonl_truncates(tmp_path):
    from tpu21cmvae.train.loop import History
    from tpu21cmvae.utils.logging import history_to_jsonl, read_jsonl

    h = History(loss=[1.0], val_loss=[1.0], lr=[0.1], epoch_time_s=[0.1])
    path = str(tmp_path / "h.jsonl")
    history_to_jsonl(h, path)
    history_to_jsonl(h, path)  # re-export must overwrite, not append
    assert len(read_jsonl(path)) == 1


def test_atomic_write_cleans_up_on_failure(tmp_path):
    import os

    import pytest

    from tpu21cmvae.utils.io import atomic_write

    target = str(tmp_path / "out.bin")
    with pytest.raises(RuntimeError):
        with atomic_write(target) as f:
            f.write(b"partial")
            raise RuntimeError("boom")
    assert not os.path.exists(target)
    assert os.listdir(str(tmp_path)) == []  # no stray .part files


def test_cli_sample(tmp_path, splits):
    """`sample` runs on-device MH end to end: model + obs file in,
    chain npz + summary out."""
    import json as _json

    from tpu21cmvae.__main__ import main
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.utils.config import DirectEmulatorConfig

    model = DirectEmulator(
        splits, config=DirectEmulatorConfig(hidden_dims=(16,))
    )
    ckpt = str(tmp_path / "m.npz")
    model.save(ckpt)
    obs = model.predict(splits.par_test[0])
    obs_file = str(tmp_path / "obs.json")
    with open(obs_file, "w") as f:
        _json.dump({"obs": obs.tolist(), "noise_var": 25.0}, f)
    out = str(tmp_path / "chain.npz")
    main(["sample", ckpt, "--obs", obs_file, "--sampler", "mh",
          "--walkers", "32", "--steps", "20", "--warmup", "10",
          "--thin", "5", "--out", out])
    blob = np.load(out)
    assert blob["final"].shape == (32, 7)
    assert blob["chain"].shape == (4, 32, 7)
    assert np.isfinite(blob["logp"]).all()
    # nuts: the gradient sampler with per-walker diagnostics
    out_n = str(tmp_path / "chain_nuts.npz")
    main(["sample", ckpt, "--obs", obs_file, "--sampler", "nuts",
          "--walkers", "32", "--steps", "10", "--warmup", "20",
          "--max-depth", "4", "--thin", "5", "--out", out_n])
    blob_n = np.load(out_n)
    assert blob_n["final"].shape == (32, 7)
    assert np.isfinite(blob_n["mean_leapfrog"])
    assert np.isfinite(blob_n["divergence_rate"])
    # smc: particle anneal — log Z rides along
    out_s = str(tmp_path / "chain_smc.npz")
    main(["sample", ckpt, "--obs", obs_file, "--sampler", "smc",
          "--walkers", "512", "--out", out_s])
    blob_s = np.load(out_s)
    assert blob_s["final"].shape == (512, 7)
    assert np.isfinite(blob_s["logz"])
    assert blob_s["betas"][-1] == 1.0


def test_cli_fit(tmp_path, splits):
    """`fit` runs the multi-start ML fit end to end: model + obs file
    in, fit npz + summary out."""
    import json as _json

    from tpu21cmvae.__main__ import main
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.utils.config import DirectEmulatorConfig

    model = DirectEmulator(
        splits, config=DirectEmulatorConfig(hidden_dims=(16,))
    )
    ckpt = str(tmp_path / "m.npz")
    model.save(ckpt)
    obs = model.predict(splits.par_test[0])
    obs_file = str(tmp_path / "obs.json")
    with open(obs_file, "w") as f:
        _json.dump({"obs": obs.tolist(), "noise_var": 25.0}, f)
    out = str(tmp_path / "fit.npz")
    main(["fit", ckpt, "--obs", obs_file, "--starts", "32",
          "--steps", "60", "--out", out])
    blob = np.load(out)
    assert blob["params"].shape == (32, 7)
    assert blob["best"].shape == (7,)
    assert np.isfinite(blob["best_logp"])
    assert blob["logp"].max() == blob["best_logp"]


def test_cli_prior_flag(tmp_path, splits):
    """`--prior IDX:MEAN:SIGMA` builds a GaussianBoxPrior: an
    essentially-delta prior on tau pins the sampled chain there, and a
    malformed spec exits with a clear message instead of a traceback."""
    import json as _json

    import pytest

    from tpu21cmvae.__main__ import main
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.utils.config import DirectEmulatorConfig

    model = DirectEmulator(
        splits, config=DirectEmulatorConfig(hidden_dims=(16,))
    )
    ckpt = str(tmp_path / "m.npz")
    model.save(ckpt)
    obs = model.predict(splits.par_test[0])
    obs_file = str(tmp_path / "obs.json")
    with open(obs_file, "w") as f:
        _json.dump({"obs": obs.tolist(), "noise_var": 25.0}, f)
    out = str(tmp_path / "chain.npz")
    main(["sample", ckpt, "--obs", obs_file, "--sampler", "mh",
          "--walkers", "64", "--steps", "100", "--warmup", "150",
          "--thin", "5", "--prior", "3:0.054:0.0003", "--out", out])
    chain = np.load(out)["chain"].reshape(-1, 7)
    # default tau box is [0.04, 0.09] (flat mean 0.065); the tight
    # prior pulls the chain to its center within a few prior sigma
    assert abs(chain[:, 3].mean() - 0.054) < 0.003
    with pytest.raises(SystemExit, match="IDX:MEAN:SIGMA"):
        main(["sample", ckpt, "--obs", obs_file, "--prior", "bogus",
              "--out", out])


def test_cli_evidence(tmp_path, splits):
    """`evidence` runs the tempered-ladder log Z estimate end to end."""
    import json as _json

    from tpu21cmvae.__main__ import main
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.utils.config import DirectEmulatorConfig

    model = DirectEmulator(
        splits, config=DirectEmulatorConfig(hidden_dims=(16,))
    )
    ckpt = str(tmp_path / "m.npz")
    model.save(ckpt)
    obs = model.predict(splits.par_test[0])
    obs_file = str(tmp_path / "obs.json")
    with open(obs_file, "w") as f:
        _json.dump({"obs": obs.tolist(), "noise_var": 25.0}, f)
    out = str(tmp_path / "ev.npz")
    main(["evidence", ckpt, "--obs", obs_file, "--method", "ladder",
          "--rungs", "8", "--walkers", "64", "--steps", "40",
          "--warmup", "30", "--out", out])
    blob = np.load(out)
    assert np.isfinite(blob["logz"])
    assert np.isfinite(blob["ladder_drift"])
    assert blob["rung_logz"].shape == (7,)
    assert blob["posterior"].shape == (64, 7)
    # default method: nested sampling
    out2 = str(tmp_path / "ev_ns.npz")
    main(["evidence", ckpt, "--obs", obs_file, "--live", "256",
          "--mh-steps", "8", "--out", out2])
    blob2 = np.load(out2)
    assert np.isfinite(blob2["logz"])
    assert np.isfinite(blob2["logz_err"])
    assert blob2["posterior"].shape == (4096, 7)
    # laplace quick look
    out3 = str(tmp_path / "ev_lap.npz")
    main(["evidence", ckpt, "--obs", obs_file, "--method", "laplace",
          "--fit-starts", "256", "--fit-steps", "300", "--out", out3])
    blob3 = np.load(out3)
    assert np.isfinite(blob3["logz"])
    assert blob3["cov"].shape == (7, 7)
    assert blob3["posterior"].shape == (4096, 7)
    # adaptive tempered SMC (n_particles = 8 * walkers)
    out4 = str(tmp_path / "ev_smc.npz")
    main(["evidence", ckpt, "--obs", obs_file, "--method", "smc",
          "--walkers", "64", "--out", out4])
    blob4 = np.load(out4)
    assert np.isfinite(blob4["logz"])
    assert np.isfinite(blob4["logz_err"])
    assert blob4["posterior"].shape == (512, 7)
    assert blob4["betas"][-1] == 1.0


def test_cli_sbc(tmp_path, splits):
    """`sbc` runs a small calibration study end to end and writes the
    rank/p-value artifact."""
    from tpu21cmvae.__main__ import main
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.utils.config import DirectEmulatorConfig

    model = DirectEmulator(
        splits, config=DirectEmulatorConfig(hidden_dims=(16,))
    )
    ckpt = str(tmp_path / "m.npz")
    model.save(ckpt)
    out = str(tmp_path / "sbc.npz")
    rc = main(["sbc", ckpt, "--sims", "24", "--walkers", "32",
               "--steps", "60", "--warmup", "80", "--out", out])
    blob = np.load(out)
    assert blob["ranks"].shape == (24, 7)
    assert blob["pvalues"].shape == (7,)
    assert rc in (0, 1)  # verdict exit code, artifact either way


def test_cli_advi_and_profile(tmp_path, splits):
    """`advi` and `profile` run end to end from the shell: model + obs
    in, posterior/interval npz + summary out."""
    import json as _json

    from tpu21cmvae.__main__ import main
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.utils.config import DirectEmulatorConfig

    model = DirectEmulator(
        splits, config=DirectEmulatorConfig(hidden_dims=(16,))
    )
    ckpt = str(tmp_path / "m.npz")
    model.save(ckpt)
    obs = model.predict(splits.par_test[0])
    obs_file = str(tmp_path / "obs.json")
    with open(obs_file, "w") as f:
        _json.dump({"obs": obs.tolist(), "noise_var": 25.0}, f)

    out = str(tmp_path / "advi.npz")
    main(["advi", ckpt, "--obs", obs_file, "--steps", "60", "--mc", "64",
          "--samples", "128", "--out", out])
    blob = np.load(out)
    assert blob["samples"].shape == (128, 7)
    assert blob["mu"].shape == (7,) and blob["chol"].shape == (7, 7)
    assert np.isfinite(blob["elbo"]).all()

    out2 = str(tmp_path / "prof.npz")
    main(["profile", ckpt, "--obs", obs_file, "--index", "3",
          "--points", "7", "--starts", "16", "--steps", "40",
          "--out", out2])
    blob2 = np.load(out2)
    assert blob2["grid"].shape == (7,) and blob2["logl"].shape == (7,)
    lo68, hi68 = blob2["interval68"]
    lo95, hi95 = blob2["interval95"]
    assert lo95 <= lo68 <= hi68 <= hi95


def test_cli_gof(tmp_path, splits):
    """`gof` scores a chain file against its observation: exit 0 when
    the model family generated the data, exit 1 on an un-modeled
    ripple, exit 2 under the (refused) scale-marginal spec. The chain
    is fabricated at the truth (plus jitter) so residuals are EXACTLY
    the injected noise — the verdicts are deterministic; the
    statistical behavior over real chains is covered by
    tests/test_calibration.py."""
    import json as _json

    from tpu21cmvae.__main__ import main
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.utils.config import DirectEmulatorConfig

    model = DirectEmulator(
        splits, config=DirectEmulatorConfig(hidden_dims=(16,))
    )
    ckpt = str(tmp_path / "m.npz")
    model.save(ckpt)
    rng = np.random.default_rng(0)
    truth = np.asarray(splits.par_test[0], np.float32)
    clean = np.asarray(model.predict(truth))
    obs = clean + rng.normal(0.0, 5.0, clean.shape)
    obs_file = str(tmp_path / "obs.json")
    with open(obs_file, "w") as f:
        _json.dump({"obs": obs.tolist(), "noise_var": 25.0}, f)
    draws = truth[None] + (
        rng.normal(0, 1e-4, (2, 64, 7)).astype(np.float32)
        * np.abs(truth)
    )
    chain = str(tmp_path / "chain.npz")
    np.savez_compressed(chain, chain=draws, final=draws[-1])
    rc = main(["gof", ckpt, "--obs", obs_file, "--chain", chain])
    assert rc == 0
    # un-modeled ripple -> misfit exit (same draws: the signal family
    # cannot absorb it)
    nu = np.asarray(model.frequencies)
    bad = obs + 25.0 * np.sin(2 * np.pi * (nu - nu.min()) / 8.0)
    bad_file = str(tmp_path / "obs_bad.json")
    with open(bad_file, "w") as f:
        _json.dump({"obs": bad.tolist(), "noise_var": 25.0}, f)
    assert main(["gof", ckpt, "--obs", bad_file,
                 "--chain", chain]) == 1
    # final-only chain files (thin=0 runs) work too
    chain_f = str(tmp_path / "chain_final.npz")
    np.savez_compressed(
        chain_f, chain=np.zeros((0, 64, 7), np.float32),
        final=draws[-1],
    )
    assert main(["gof", ckpt, "--obs", obs_file,
                 "--chain", chain_f]) == 0
    # scale-marginal spec is refused with an actionable error (rc 2)
    assert main(["gof", ckpt, "--obs", obs_file, "--chain", chain,
                 "--marginalize-noise-scale"]) == 2


def test_cli_evidence_batch_auto(tmp_path, splits, capsys):
    """A MULTI-observation spec file routes `evidence` to the batched
    khat-escalation pipeline (round 4): per-row table + npz with
    method_used, --method auto accepted, per-obs-only methods refused,
    mismatched per-row noise refused, and single-obs `--method auto`
    refused with guidance."""
    import json as _json

    from tpu21cmvae.__main__ import main
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.utils.config import DirectEmulatorConfig

    model = DirectEmulator(
        splits, config=DirectEmulatorConfig(hidden_dims=(16,))
    )
    ckpt = str(tmp_path / "m.npz")
    model.save(ckpt)
    rows = [np.asarray(model.predict(splits.par_test[i])).tolist()
            for i in (0, 1)]
    spec = str(tmp_path / "obs.json")
    with open(spec, "w") as f:
        _json.dump([{"obs": o, "noise_var": 25.0} for o in rows], f)
    out = str(tmp_path / "evb.npz")
    rc = main(["evidence", ckpt, "--obs", spec, "--method", "auto",
               "--out", out])
    assert rc == 0
    blob = np.load(out)
    assert blob["logz"].shape == (2,)
    assert np.isfinite(blob["logz"]).all()
    assert set(blob["method_used"]) <= {"laplace", "flow", "nested",
                                        "smc"}
    assert blob["map_params"].shape == (2, 7)
    assert "method" in capsys.readouterr().out  # the per-row table

    # per-observation method on a batch file → actionable refusal
    assert main(["evidence", ckpt, "--obs", spec, "--method", "nested",
                 "--out", out]) == 2
    # mismatched per-row noise → refusal
    spec2 = str(tmp_path / "obs2.json")
    with open(spec2, "w") as f:
        _json.dump([{"obs": rows[0], "noise_var": 25.0},
                    {"obs": rows[1], "noise_var": 16.0}], f)
    assert main(["evidence", ckpt, "--obs", spec2, "--method", "auto",
                 "--out", out]) == 2
    # --method auto on a SINGLE observation → refusal with guidance
    spec1 = str(tmp_path / "obs1.json")
    with open(spec1, "w") as f:
        _json.dump({"obs": rows[0], "noise_var": 25.0}, f)
    assert main(["evidence", ckpt, "--obs", spec1, "--method", "auto",
                 "--out", out]) == 2
    # --final is batch-only too (on one obs: just --method nested)
    assert main(["evidence", ckpt, "--obs", spec1,
                 "--method", "laplace", "--final", "nested",
                 "--out", out]) == 2
    # empty and ragged spec files refuse cleanly, not with a traceback
    spec_empty = str(tmp_path / "obs_empty.json")
    with open(spec_empty, "w") as f:
        _json.dump([], f)
    assert main(["evidence", ckpt, "--obs", spec_empty,
                 "--method", "auto", "--out", out]) == 2
    # estimator-tuning flags reach the batched stages (cheap budgets
    # must make this FASTER than defaults, and the prior's transform is
    # wired through to the final nested stage instead of crashing)
    from tpu21cmvae.priors import GaussianBoxPrior  # noqa: F401
    rc = main(["evidence", ckpt, "--obs", spec, "--method", "auto",
               "--final", "nested", "--fit-starts", "128",
               "--fit-steps", "200", "--live", "128", "--mh-steps", "4",
               "--prior", "3:0.06:0.02", "--out", out])
    assert rc == 0
    blob2 = np.load(out)
    assert np.isfinite(blob2["logz"]).all()


def test_cli_top_level_help_renders(capsys):
    """`python -m tpu21cmvae --help` must render: argparse interpolates
    EVERY subcommand's help string when the top-level help formats, so
    one unescaped % anywhere crashes it (the profile subcommand's
    'Wilks 68/95%' did exactly that — found by driving --help, which no
    subcommand-level test exercises)."""
    import pytest

    from tpu21cmvae.__main__ import main

    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    for cmd in ("train", "sample", "evidence", "profile", "serve"):
        assert cmd in out
    # every subcommand's OWN help formats different strings — render all
    for cmd in ("download", "train", "evaluate", "predict", "tune",
                "sample", "fit", "advi", "profile", "evidence", "sbc",
                "gof", "serve", "verify", "export-h5",
                "export-artifact"):
        with pytest.raises(SystemExit) as e:
            main([cmd, "--help"])
        assert e.value.code == 0, cmd
        capsys.readouterr()
