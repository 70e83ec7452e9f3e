"""Execute the walkthrough notebook headless (VERDICT round 1, item 10).

The reference ships its user surface as notebooks
(``sample_notebook.ipynb``, ``Training.ipynb`` — SURVEY.md §2.1 item
15); this repo's equivalent must actually run offline, so CI executes
it end-to-end with nbclient on the virtual CPU mesh and asserts every
cell succeeded.
"""

import os

import pytest

nbformat = pytest.importorskip("nbformat")
nbclient = pytest.importorskip("nbclient")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTEBOOK = os.path.join(ROOT, "notebooks", "walkthrough.ipynb")


def test_notebook_is_current():
    """The committed .ipynb matches its build script (single source)."""
    import sys

    sys.path.insert(0, os.path.join(ROOT, "notebooks"))
    try:
        from build_walkthrough import build
    finally:
        sys.path.pop(0)
    want = build()
    got = nbformat.read(NOTEBOOK, as_version=4)
    assert [c.source for c in got.cells] == [c.source for c in want.cells]


def test_notebook_executes_clean():
    os.environ.setdefault("MPLBACKEND", "Agg")
    os.environ["TPU21CMVAE_NB_FAST"] = "1"  # trim the training cell in CI
    nb = nbformat.read(NOTEBOOK, as_version=4)
    client = nbclient.NotebookClient(
        nb,
        timeout=900,  # headroom for loaded CI machines; ~4 min idle
        kernel_name="python3",
        resources={"metadata": {"path": ROOT}},
    )
    client.execute()  # raises CellExecutionError on any failing cell
    # spot-check: the test-error cell printed the figure of merit
    outputs = [
        o.get("text", "")
        for c in nb.cells
        if c.cell_type == "code"
        for o in c.get("outputs", [])
        if o.get("output_type") == "stream"
    ]
    joined = "\n".join(outputs)
    assert "relative: mean" in joined
    assert "AE pipeline" in joined
