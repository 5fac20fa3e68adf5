import numpy as np, pandas as pd, sys, os
sys.path.insert(0,'/root/repo')

def test_return_folds():
    from fiude_tpu.data.loader import return_folds
    folds = return_folds(20, 5, seed=0)
    assert len(folds) == 5
    for tr, va in folds:
        assert len(tr) + len(va) == 20
        assert set(tr) | set(va) == set(range(20))
        assert not (set(tr) & set(va))

def test_rerun_best(tmp_path):
    from fiude_tpu.train.experiment import rerun_best
    csv = str(tmp_path / "scores.csv")
    pd.DataFrame([{"a": i, "started": 1, "score": 10 - i} for i in range(6)]).to_csv(csv)
    def evaluate(row, rep):
        return {"nll": row["a"] * 1.0 + rep * 0.1,
                "truth": np.arange(3.0)}
    out = rerun_best(csv, evaluate, run_best=2, run_each=2,
                     out_dir=str(tmp_path / "best"))
    df = pd.read_csv(out, index_col=0)
    assert len(df) == 4
    assert os.path.exists(str(tmp_path / "best" / "rank0_rep1.json"))
    # best score is a=5 (score 5)
    assert df.iloc[0]["nll"] == 5.0
