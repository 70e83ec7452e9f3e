"""The HTTP serving layer: a warm emulator answering JSON requests.

Runs the real stdlib server on a free port in a daemon thread and talks
to it with urllib — full request/response round trips on the virtual
CPU mesh, asserting parity with the in-process model.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from tpu21cmvae.models.direct import DirectEmulator
from tpu21cmvae.serve import EmulatorService, make_server
from tpu21cmvae.utils.config import DirectEmulatorConfig


@pytest.fixture(scope="module")
def model(splits):
    return DirectEmulator(
        splits, config=DirectEmulatorConfig(hidden_dims=(48, 56))
    )


@pytest.fixture(scope="module")
def server(model):
    srv = make_server(model, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _url(server, path):
    host, port = server.server_address[:2]
    return f"http://{host}:{port}{path}"


def _post(server, path, payload):
    req = urllib.request.Request(
        _url(server, path),
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_health(server, model):
    with urllib.request.urlopen(_url(server, "/health"), timeout=60) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    assert h["kind"] == "DirectEmulator"
    assert h["n_bins"] == model.config.n_bins
    assert h["par_labels"][0] == "fstar"


def test_predict_endpoint_matches_model(server, model, splits):
    rows = np.asarray(splits.par_test[:13], np.float32)
    out = _post(server, "/predict", {"params": rows.tolist()})
    got = np.asarray(out["signals"], np.float32)
    want = model.predict(rows)
    assert got.shape == (13, model.config.n_bins)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_loglik_endpoint_and_program_cache(server, model, splits):
    obs = model.predict(splits.par_test[0])
    rows = np.asarray(splits.par_test[:9], np.float32)
    out = _post(server, "/loglik", {
        "params": rows.tolist(), "obs": obs.tolist(), "noise_var": 25.0,
    })
    got = np.asarray(out["loglik"])
    assert got.shape == (9,)
    import jax.numpy as jnp

    want = np.asarray(
        model.loglik_fn(jnp.asarray(obs, jnp.float32), 25.0)(
            model.params, jnp.asarray(rows)
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-2)
    # second call with the same obs hits the cached program
    svc = server.service
    n_cached = len(svc._loglik)
    _post(server, "/loglik", {
        "params": rows.tolist(), "obs": obs.tolist(), "noise_var": 25.0,
    })
    assert len(svc._loglik) == n_cached


def test_bad_request_is_400_not_crash(server):
    req = urllib.request.Request(
        _url(server, "/predict"), data=b'{"wrong": 1}',
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())


def test_service_embeddable(model, splits):
    """EmulatorService works without HTTP (embedding path) + warmup."""
    svc = EmulatorService(model)
    svc.warmup((1, 64))
    out = svc.predict(splits.par_test[:3])
    assert out.shape == (3, model.config.n_bins)
    one = svc.predict(splits.par_test[0])
    assert one.shape == (1, model.config.n_bins)


def test_idle_keepalive_client_does_not_block_server(server, model, splits):
    """The single-connection server must close after each response; an
    idle keep-alive client holding its socket open must not starve the
    next client (regression: HTTP/1.1 + no timeout hung /health)."""
    import http.client

    host, port = server.server_address[:2]
    c1 = http.client.HTTPConnection(host, port, timeout=30)
    c1.request("GET", "/health")  # keep-alive by default in HTTP/1.1
    r1 = c1.getresponse()
    assert r1.status == 200
    assert r1.getheader("Connection") == "close"
    r1.read()
    # c1 stays open (idle); a second client must still get served
    with urllib.request.urlopen(_url(server, "/health"), timeout=30) as r2:
        assert json.loads(r2.read())["status"] == "ok"
    c1.close()


def test_malformed_loglik_does_not_poison_cache(server, model, splits):
    """A bad request must 400 WITHOUT caching a broken program for the
    same observation (regression), and shape errors are caught upfront."""
    obs = model.predict(splits.par_test[0])
    rows = np.asarray(splits.par_test[:4], np.float32).tolist()
    bad = {"params": rows, "obs": [obs.tolist()], "noise_var": 25.0}
    try:
        _post(server, "/loglik", bad)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "flat list" in json.loads(e.read())["error"]
    # the SAME obs, well-formed, must now succeed
    out = _post(server, "/loglik", {
        "params": rows, "obs": obs.tolist(), "noise_var": 25.0,
    })
    assert np.isfinite(out["loglik"]).all()


def test_warmup_up_to_covers_all_buckets(model):
    svc = EmulatorService(model)
    svc.warmup(up_to=64)  # quantum 8 → buckets 8, 16, 32, 64
    # all four programs are now compiled; calls at any size are warm
    for n in (3, 11, 30, 60):
        assert svc.predict(np.zeros((n, 7), np.float32)).shape[0] == n


def test_oversized_body_rejected_413(server):
    """A client-declared Content-Length above the cap is refused before
    the single-threaded server reads (or compiles for) any of it."""
    import urllib.error

    from tpu21cmvae.serve import MAX_BODY_BYTES

    req = urllib.request.Request(
        _url(server, "/predict"),
        data=b"x" * 64,  # body itself is tiny; the DECLARED length is huge
        headers={
            "Content-Type": "application/json",
            "Content-Length": str(MAX_BODY_BYTES + 1),
        },
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 413
    assert "limit" in json.loads(exc.value.read())["error"]


def test_warmup_loglik_first_request_is_warm(model, splits):
    """A warmed (obs, noise_var) pair's first /loglik builds NO new
    program: after warmup_loglik, the builder is poisoned and the
    request must still succeed (cache hit); an unwarmed obs proves the
    poison is effective."""
    svc = EmulatorService(model, loglik_cache=4)
    obs = np.asarray(splits.signal_test[0], np.float32)
    svc.warmup_loglik([(obs, 25.0)], batch_sizes=(4,))

    real_loglik_fn = svc.model.loglik_fn

    def poisoned(*a, **k):
        raise AssertionError("cold program build after warmup")

    svc.model.loglik_fn = poisoned
    try:
        out = svc.loglik(splits.par_test[:3], obs, 25.0)
        assert out.shape == (3,) and np.isfinite(out).all()
        with pytest.raises(AssertionError, match="cold program build"):
            svc.loglik(splits.par_test[:3], obs + 1.0, 25.0)
    finally:
        svc.model.loglik_fn = real_loglik_fn


def test_warmed_loglik_entries_respect_lru_cap(model, splits):
    svc = EmulatorService(model, loglik_cache=2)
    base = np.asarray(splits.signal_test[0], np.float32)
    svc.warmup_loglik([(base + i, 25.0) for i in range(4)], batch_sizes=(4,))
    assert len(svc._loglik) <= 2


def test_health_answers_during_long_device_call(server, model):
    """The threading server + device lock keep /health responsive while
    a device call (or cold compile) is in flight."""
    import time as _time

    svc = server.service
    real = svc._sharded

    class Slow:
        def __call__(self, params):
            _time.sleep(2.0)
            return real(params)

    svc._sharded = Slow()
    try:
        t = threading.Thread(
            target=lambda: _post(
                server, "/predict", {"params": [[0.05, 16, 1, 0.06, 1.3, 2, 30]]}
            ),
            daemon=True,
        )
        t.start()
        _time.sleep(0.3)  # let the slow predict take the device lock
        t0 = _time.perf_counter()
        with urllib.request.urlopen(_url(server, "/health"), timeout=60) as r:
            assert json.loads(r.read())["status"] == "ok"
        assert _time.perf_counter() - t0 < 1.5
        t.join(timeout=30)
    finally:
        svc._sharded = real


def test_load_obs_specs_roundtrip(tmp_path, splits):
    from tpu21cmvae.serve import load_obs_specs

    obs = np.asarray(splits.signal_test[:2], np.float32)
    jpath = tmp_path / "specs.json"
    jpath.write_text(json.dumps([
        {"obs": obs[0].tolist(), "noise_var": 25.0},
        {"obs": obs[1].tolist()},
    ]))
    specs = load_obs_specs(str(jpath))
    assert len(specs) == 2
    np.testing.assert_allclose(specs[0][0], obs[0])
    assert float(specs[0][1]) == 25.0 and float(specs[1][1]) == 1.0

    npath = tmp_path / "specs.npz"
    np.savez(npath, obs=obs, noise_var=np.float32(9.0))
    specs = load_obs_specs(str(npath))
    assert len(specs) == 2 and float(specs[1][1]) == 9.0

    # (k,) noise_var = one scalar per observation, NOT a broadcast of
    # the whole vector onto every observation
    np.savez(npath, obs=obs, noise_var=np.array([25.0, 16.0]))
    specs = load_obs_specs(str(npath))
    assert [float(nv) for _, nv in specs] == [25.0, 16.0]

    # (n_bins,) noise_var = one per-bin curve shared by every obs
    curve = np.linspace(1.0, 2.0, obs.shape[1]).astype(np.float32)
    np.savez(npath, obs=obs, noise_var=curve)
    specs = load_obs_specs(str(npath))
    assert specs[0][1].shape == (obs.shape[1],)
    np.testing.assert_allclose(specs[1][1], curve)

    # anything matching neither axis is rejected loudly
    np.savez(npath, obs=obs, noise_var=np.ones(5, np.float32))
    with pytest.raises(ValueError, match="matches neither"):
        load_obs_specs(str(npath))


def test_sample_endpoint_posterior_and_program_reuse(server, model, splits):
    """POST /sample runs a full on-device chain and returns a sane
    posterior summary; a repeat request with the same statics reuses
    the cached chain program (the per-closure cache holds ONE entry)."""
    truth = np.asarray(splits.par_test[0], np.float32)
    obs = np.asarray(model.predict(truth))
    par = np.asarray(splits.par_train, np.float64)
    lo, hi = par.min(0), par.max(0)
    lo[:3] = np.maximum(lo[:3], 1e-6)
    req = {
        "obs": obs.tolist(), "noise_var": 25.0,
        "bounds": np.stack([lo, hi], 1).tolist(),
        "n_walkers": 64, "n_steps": 40, "n_warmup": 60, "thin": 10,
        "seed": 0, "max_samples": 50,
    }
    out = _post(server, "/sample", req)
    assert out["sampler"] == "mh"
    assert len(out["mean"]) == 7 and len(out["ess"]) == 7
    assert out["quantiles"]["0.5"][3] == pytest.approx(
        out["mean"][3], abs=5 * out["std"][3]
    )
    assert 1 <= len(out["samples"]) <= 50
    assert out["accept_rate"] > 0.05
    # same statics, new seed → different samples out
    out2 = _post(server, "/sample", dict(req, seed=1))
    assert out2["mean"] != out["mean"]

    # PT over HTTP: diagnostics included
    pt = _post(server, "/sample", dict(
        req, sampler="pt", n_rungs=8, n_walkers=32, n_steps=20,
        n_warmup=20,
    ))
    assert len(pt["swap_rate"]) == 7 and pt["betas"][-1] == 1.0

    # option validation → 400
    import urllib.error

    for bad in (dict(req, n_walkers=10**6), dict(req, bogus=1),
                dict(req, sampler="hmc")):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server, "/sample", bad)
        assert ei.value.code == 400


def test_sample_service_reuses_chain_program(model, splits):
    """Embedded view of what /sample promises: two requests with the
    same statics share ONE compiled chain program (cached on the same
    likelihood closure /loglik uses), and the PT request adds its own."""
    svc = EmulatorService(model)
    truth = np.asarray(splits.par_test[0], np.float32)
    obs = np.asarray(model.predict(truth))
    par = np.asarray(splits.par_train, np.float64)
    lo, hi = par.min(0), par.max(0)
    lo[:3] = np.maximum(lo[:3], 1e-6)
    kw = dict(bounds=np.stack([lo, hi], 1).tolist(), n_walkers=64,
              n_steps=30, n_warmup=40, thin=10)
    svc.sample(obs, 25.0, seed=0, **kw)
    svc.sample(obs, 25.0, seed=1, **kw)
    (_, fn), = list(svc._loglik.values())
    assert len(fn._t21_chain_cache) == 1
    svc.sample(obs, 25.0, sampler="pt", n_rungs=8, seed=0,
               **dict(kw, n_walkers=32, n_steps=16, n_warmup=10))
    assert len(fn._t21_chain_cache) == 2


def test_loglik_eviction_frees_chain_programs(model, splits):
    """When the per-observation LRU evicts an entry, the likelihood
    closure — and the chain programs cached ON it — become garbage
    (no global registry pins them): a long-lived server cycling
    observations cannot accumulate compiled chain programs."""
    import gc
    import weakref

    svc = EmulatorService(model, loglik_cache=1)
    par = np.asarray(splits.par_train, np.float64)
    lo, hi = par.min(0), par.max(0)
    lo[:3] = np.maximum(lo[:3], 1e-6)
    kw = dict(bounds=np.stack([lo, hi], 1).tolist(), n_walkers=64,
              n_steps=40, n_warmup=10, thin=10, seed=0)
    obs_a = np.asarray(model.predict(splits.par_test[0]))
    obs_b = np.asarray(model.predict(splits.par_test[1]))
    svc.sample(obs_a, 25.0, **kw)
    entry_a, = list(svc._loglik.values())
    assert len(entry_a[1]._t21_chain_cache) == 1
    ref = weakref.ref(entry_a[1])
    del entry_a  # the tuple holds (ShardedEmulator, fn) — drop both
    svc.sample(obs_b, 25.0, **kw)  # cap 1 → evicts obs_a's entry
    assert len(svc._loglik) == 1
    gc.collect()
    assert ref() is None, "evicted loglik closure (and its chain "\
        "programs) still pinned"


def test_fit_endpoint(server, model, splits):
    """POST /fit returns the multi-start ML fit: best row near the
    observation's truth, ranked top block, option validation."""
    truth = np.asarray(splits.par_test[2], np.float32)
    obs = np.asarray(model.predict(truth))
    par = np.asarray(splits.par_train, np.float64)
    lo, hi = par.min(0), par.max(0)
    lo[:3] = np.maximum(lo[:3], 1e-6)
    req = {
        "obs": obs.tolist(), "noise_var": 1.0,
        "bounds": np.stack([lo, hi], 1).tolist(),
        "n_starts": 128, "n_steps": 120, "seed": 0, "top": 5,
    }
    out = _post(server, "/fit", req)
    assert len(out["best"]) == 7
    assert len(out["top"]) == 5 and len(out["top_logp"]) == 5
    assert out["top_logp"][0] == pytest.approx(out["best_logp"])
    assert out["top_logp"] == sorted(out["top_logp"], reverse=True)
    best = np.asarray(out["best"])
    assert (best >= lo - 1e-6).all() and (best <= hi + 1e-6).all()
    # noiseless obs from the model itself -> the short 120-step budget
    # refits the 451-bin signal to ~1 mK rms (logL = -||r||^2/2 at
    # noise_var=1; random-box params score ~-1e5 on this model)
    assert out["best_logp"] > -2000.0

    import urllib.error

    for bad in (dict(req, n_starts=10**6), dict(req, bogus=1),
                dict(req, top=0)):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server, "/fit", bad)
        assert ei.value.code == 400


def test_evidence_endpoint(server, model, splits):
    """POST /evidence: laplace default (deterministic, MAP+cov) and
    nested (logz_err + posterior block); both agree to a few nats."""
    truth = np.asarray(splits.par_test[0], np.float32)
    obs = np.asarray(model.predict(truth))
    par = np.asarray(splits.par_train, np.float64)
    lo, hi = par.min(0), par.max(0)
    lo[:3] = np.maximum(lo[:3], 1e-6)
    req = {
        "obs": obs.tolist(), "noise_var": 25.0,
        "bounds": np.stack([lo, hi], 1).tolist(), "seed": 0,
    }
    lap = _post(server, "/evidence", dict(req, n_starts=128,
                                          n_steps=400))
    assert lap["method"] == "laplace"
    assert np.isfinite(lap["logz"])
    assert len(lap["map_params"]) == 7
    assert np.asarray(lap["cov"]).shape == (7, 7)
    nes = _post(server, "/evidence", dict(
        req, method="nested", n_live=256, n_mh=8, max_samples=64,
    ))
    assert nes["method"] == "nested"
    assert np.isfinite(nes["logz"]) and nes["logz_err"] > 0
    assert 1 <= len(nes["posterior"]) <= 64
    assert abs(lap["logz"] - nes["logz"]) < 6.0
    smc = _post(server, "/evidence", dict(
        req, method="smc", n_particles=512, n_mh=4, max_samples=64,
    ))
    assert smc["method"] == "smc"
    assert np.isfinite(smc["logz"]) and smc["logz_err"] >= 0
    assert smc["n_stages"] >= 2
    assert 1 <= len(smc["posterior"]) <= 64
    assert abs(smc["logz"] - nes["logz"]) < 6.0

    import urllib.error

    for bad in (dict(req, method="ladder"), dict(req, n_live=10**6),
                dict(req, method="smc", n_particles=10**6),
                dict(req, bogus=1)):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server, "/evidence", bad)
        assert ei.value.code == 400


def test_foreground_marginalized_endpoints(server, model, splits):
    """`fg_terms` on /loglik, /sample and /evidence marginalizes a
    linear foreground out of the served likelihood: values match the
    in-process MarginalizedNoise likelihood, the spec keys the program
    cache by value, and a bad basis is a 400."""
    from tpu21cmvae.foregrounds import linlog_basis

    rng = np.random.default_rng(5)
    F = linlog_basis(model.frequencies, 4)
    sig = np.asarray(model.predict(splits.par_test[0]))
    obs = (sig + F @ np.array([800.0, -60.0, 20.0, -4.0])
           + rng.normal(0, 5, sig.shape)).astype(np.float32)
    rows = np.asarray(splits.par_test[:9], np.float32)
    fg = {"fg_terms": 4, "fg_basis": "linlog"}
    out = _post(server, "/loglik", {
        "params": rows.tolist(), "obs": obs.tolist(),
        "noise_var": 25.0, **fg,
    })
    mn = model.marginalize_foreground(25.0, n_terms=4, basis="linlog")
    want = np.asarray(model.loglik_fn(obs, mn)(model.params, rows))
    np.testing.assert_allclose(np.asarray(out["loglik"]), want,
                               rtol=2e-4, atol=2e-2)
    # value-keyed cache: same spec → no new entry; different K → new
    svc = server.service
    n_cached = len(svc._loglik)
    _post(server, "/loglik", {
        "params": rows.tolist(), "obs": obs.tolist(),
        "noise_var": 25.0, **fg,
    })
    assert len(svc._loglik) == n_cached
    _post(server, "/loglik", {
        "params": rows.tolist(), "obs": obs.tolist(),
        "noise_var": 25.0, "fg_terms": 3,
    })
    assert len(svc._loglik) == n_cached + 1

    out = _post(server, "/sample", {
        "obs": obs.tolist(), "noise_var": 25.0, **fg,
        "n_walkers": 128, "n_steps": 40, "n_warmup": 20, "thin": 4,
        "max_samples": 64,
    })
    assert len(out["mean"]) == model.config.n_params
    assert np.isfinite(out["mean"]).all()

    out = _post(server, "/evidence", {
        "obs": obs.tolist(), "noise_var": 25.0, **fg,
        "method": "laplace", "n_starts": 256, "n_steps": 200,
    })
    assert np.isfinite(out["logz"])

    bad = urllib.request.Request(
        _url(server, "/loglik"),
        data=json.dumps({
            "params": rows.tolist(), "obs": obs.tolist(),
            "fg_terms": 4, "fg_basis": "sinusoid",
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(bad, timeout=60)
        raise AssertionError("bad fg_basis accepted")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_scale_marginal_endpoints(server, model, splits):
    """`noise_scale_marginal` on /loglik marginalizes the noise LEVEL:
    values match the in-process ScaleMarginalNoise likelihood, it
    composes with fg_terms, the cache keys by spec value, and
    alpha-without-flag is a 400."""
    from tpu21cmvae.noisescale import marginalize_noise_scale

    rng = np.random.default_rng(9)
    sig = np.asarray(model.predict(splits.par_test[0]))
    obs = (sig + rng.normal(0, 10.0, sig.shape)).astype(np.float32)
    rows = np.asarray(splits.par_test[:7], np.float32)
    out = _post(server, "/loglik", {
        "params": rows.tolist(), "obs": obs.tolist(),
        "noise_var": 25.0, "noise_scale_marginal": True,
    })
    sm = marginalize_noise_scale(np.full(sig.shape[-1], 25.0, np.float32))
    want = np.asarray(model.loglik_fn(obs, sm)(model.params, rows))
    np.testing.assert_allclose(np.asarray(out["loglik"]), want,
                               rtol=2e-4, atol=2e-2)
    # composed with a foreground spec + proper InvGamma prior
    out2 = _post(server, "/loglik", {
        "params": rows.tolist(), "obs": obs.tolist(),
        "noise_var": 25.0, "noise_scale_marginal": True,
        "noise_alpha": 3.0, "noise_beta": 2.0, "fg_terms": 3,
    })
    mn = model.marginalize_foreground(
        np.full(sig.shape[-1], 25.0, np.float32), n_terms=3,
    )
    sm2 = marginalize_noise_scale(mn, alpha=3.0, beta=2.0)
    want2 = np.asarray(model.loglik_fn(obs, sm2)(model.params, rows))
    np.testing.assert_allclose(np.asarray(out2["loglik"]), want2,
                               rtol=2e-4, atol=2e-2)
    # value-keyed cache: repeat spec → no new entry
    svc = server.service
    n_cached = len(svc._loglik)
    _post(server, "/loglik", {
        "params": rows.tolist(), "obs": obs.tolist(),
        "noise_var": 25.0, "noise_scale_marginal": True,
    })
    assert len(svc._loglik) == n_cached
    # alpha without the flag is a 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, "/loglik", {
            "params": rows.tolist(), "obs": obs.tolist(),
            "noise_var": 25.0, "noise_alpha": 3.0,
        })
    assert ei.value.code == 400
    # /sample under the scale marginal executes
    out3 = _post(server, "/sample", {
        "obs": obs.tolist(), "noise_var": 25.0,
        "noise_scale_marginal": True, "n_walkers": 128, "n_steps": 40,
        "n_warmup": 20, "thin": 4, "max_samples": 32,
    })
    assert np.isfinite(out3["mean"]).all()


def test_gof_endpoint(server, model, splits):
    """POST /gof scores supplied posterior draws against the
    observation: clean truth-draws pass, a ripple-corrupted observation
    reports misfit with the worst-bin diagnostic, missing draws and
    the scale-marginal spec are 400s."""
    rng = np.random.default_rng(3)
    truth = np.asarray(splits.par_test[0], np.float64)
    clean = np.asarray(model.predict(truth))
    obs = clean + rng.normal(0.0, 5.0, clean.shape)
    draws = (truth[None] * (1 + rng.normal(0, 1e-4, (64, 7)))).tolist()
    out = _post(server, "/gof", {
        "obs": obs.tolist(), "noise_var": 25.0, "draws": draws,
    })
    assert 0.01 < out["p_value"] < 0.99, out
    assert out["dof"] == clean.shape[0]
    assert abs(out["q_over_dof"] - 1.0) < 0.2
    assert "no evidence" in out["summary"]
    # corrupted observation, same draws
    nu = np.asarray(model.frequencies)
    bad = obs + 25.0 * np.sin(2 * np.pi * (nu - nu.min()) / 8.0)
    out_bad = _post(server, "/gof", {
        "obs": bad.tolist(), "noise_var": 25.0, "draws": draws,
    })
    assert out_bad["p_value"] < 0.01
    assert out_bad["max_bin_z"] > 3.0
    assert 0 <= out_bad["worst_bin"] < clean.shape[0]
    # fg-marginalized spec: dof drops by K
    out_fg = _post(server, "/gof", {
        "obs": obs.tolist(), "noise_var": 25.0, "draws": draws,
        "fg_terms": 4,
    })
    assert out_fg["dof"] == clean.shape[0] - 4
    # missing draws and scale-marginal spec are client errors
    import urllib.error
    for payload in (
        {"obs": obs.tolist(), "noise_var": 25.0},
        {"obs": obs.tolist(), "noise_var": 25.0, "draws": draws,
         "noise_scale_marginal": True},
        {"obs": obs.tolist(), "noise_var": 25.0, "draws": draws,
         "bogus_option": 1},
    ):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server, "/gof", payload)
        assert ei.value.code == 400


def test_async_sample_job_keeps_server_live(server, model, splits):
    """Round-3 VERDICT #8: a LONG chain must not starve other clients.
    Submit a long /sample as an async job (202 + /result/<id>), then —
    while it runs — prove /health and a short /predict answer
    immediately, a sync /sample with busy_timeout_s gets an honest 503
    with a retry hint instead of queueing, and the polled result
    eventually matches the normal endpoint's shape."""
    import time
    import urllib.error

    obs = np.asarray(model.predict(splits.par_test[3]))
    long_req = {
        "obs": obs.tolist(), "noise_var": 25.0, "async": True,
        # big enough to hold the device for several seconds on CPU
        "n_walkers": 1024, "n_steps": 800, "n_warmup": 400,
        "thin": 10, "seed": 0,
    }
    sub = _post(server, "/sample", long_req)
    assert set(sub) == {"job_id", "result_path"}

    # while the job runs the handler thread pool is free: /health (no
    # device lock) answers immediately — the 202 means the long chain
    # pins neither a handler thread nor the client connection
    t0 = time.monotonic()
    with urllib.request.urlopen(_url(server, "/health"), timeout=10) as r:
        assert json.loads(r.read())["status"] == "ok"
    assert time.monotonic() - t0 < 5.0

    # a sync sample refusing to wait gets 503 + retry hint while the
    # job holds the device (poll until we catch it running — the job
    # may still be queued for a moment)
    saw_503 = False
    for _ in range(100):
        status = json.loads(urllib.request.urlopen(
            _url(server, sub["result_path"]), timeout=10
        ).read())
        if status["status"] == "running":
            try:
                _post(server, "/sample", {
                    "obs": obs.tolist(), "noise_var": 25.0,
                    "busy_timeout_s": 0.05, "n_walkers": 64,
                    "n_steps": 20, "n_warmup": 10, "thin": 5,
                })
            except urllib.error.HTTPError as e:
                assert e.code == 503
                body = json.loads(e.read())
                assert "retry" in json.dumps(body)
                saw_503 = True
                break
        elif status["status"] in ("done", "error"):
            break
        time.sleep(0.05)

    # poll to completion; the payload matches the sync endpoint's shape
    for _ in range(600):
        status = json.loads(urllib.request.urlopen(
            _url(server, sub["result_path"]), timeout=10
        ).read())
        if status["status"] in ("done", "error"):
            break
        time.sleep(0.1)
    assert status["status"] == "done", status
    assert status["sampler"] == "mh"
    assert len(status["mean"]) == model.config.n_params
    assert status["ess"] is not None and status["ess_tail"] is not None
    # the job outran at least one of our probes, or finished so fast
    # the 503 window never existed — either way the liveness asserts
    # above carried the test; record which path ran for the log
    print(f"saw_503={saw_503}")

    # unknown job id is a clean 400
    try:
        urllib.request.urlopen(_url(server, "/result/nope"), timeout=10)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_async_jobs_generalize_to_evidence_and_fit(server, model, splits):
    """Every long device-bound POST honors async=true (round 4): an
    /evidence and a /fit submitted as jobs complete with the same
    payload shape as the sync endpoints, and an invalid async job
    surfaces its error through /result rather than killing the worker."""
    import time
    import urllib.request as _rq

    obs = np.asarray(model.predict(splits.par_test[5]))

    def run_job(path, payload):
        sub = _post(server, path, {**payload, "async": True})
        assert set(sub) == {"job_id", "result_path"}
        for _ in range(600):
            st = json.loads(_rq.urlopen(
                _url(server, sub["result_path"]), timeout=10
            ).read())
            if st["status"] in ("done", "error"):
                return st
            time.sleep(0.1)
        raise AssertionError(f"job did not finish: {st}")

    ev = run_job("/evidence", {
        "obs": obs.tolist(), "noise_var": 25.0, "method": "laplace",
        "n_starts": 128, "n_steps": 200, "seed": 0,
    })
    assert ev["status"] == "done"
    assert np.isfinite(ev["logz"])

    fit = run_job("/fit", {
        "obs": obs.tolist(), "noise_var": 25.0,
        "n_starts": 64, "n_steps": 100, "seed": 0,
    })
    assert fit["status"] == "done"
    assert len(fit["best"]) == model.config.n_params

    bad = run_job("/fit", {
        "obs": obs.tolist(), "noise_var": 25.0, "bogus_option": 1,
    })
    assert bad["status"] == "error" and "bogus_option" in bad["error"]
    # ... and the worker survived: another good job still completes
    ev2 = run_job("/evidence", {
        "obs": obs.tolist(), "noise_var": 25.0, "method": "laplace",
        "n_starts": 128, "n_steps": 200, "seed": 1,
    })
    assert ev2["status"] == "done"
