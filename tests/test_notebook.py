"""Execute the dev notebook's code cells end-to-end (tiny epochs).

``notebooks/run_ode_dev.ipynb`` is the interactive equivalent of the
reference's ``run_ode.ipynb`` Bayes workflow; this keeps its cells runnable
against the live API (the reference's tuning entry points rotted exactly
this way — ``tuning/tune_encoders.py:26`` imports a module that no longer
exists).
"""

import json
import os

import matplotlib

matplotlib.use("Agg")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTEBOOK = os.path.join(REPO, "notebooks", "run_ode_dev.ipynb")


def test_notebook_cells_execute(tmp_path, monkeypatch):
    with open(NOTEBOOK) as fh:
        nb = json.load(fh)
    cells = ["".join(c["source"]) for c in nb["cells"]
             if c["cell_type"] == "code"]
    assert len(cells) >= 7

    monkeypatch.setenv("NB_EPOCHS", "2")
    monkeypatch.setenv("NB_SAMPLES", "4")
    monkeypatch.chdir(tmp_path)

    ns = {}
    for i, src in enumerate(cells):
        exec(compile(src, f"{NOTEBOOK}:cell{i}", "exec"), ns)

    # the final cell leaves per-horizon metrics in scope
    hist = ns["trainer"].history.epoch_history
    assert len(hist) == 2
    assert all(k in hist[0] for k in ("loss", "nll"))
