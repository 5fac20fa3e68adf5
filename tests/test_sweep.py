"""Sweep subsystem: ledger protocol, results upsert, device-parallel population."""
import os

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from fiude_tpu.data.loader import ArrayLoader
from fiude_tpu.data.synthetic import synthetic_dataset
from fiude_tpu.models import UDEForecaster
from fiude_tpu.parallel import config_mesh
from fiude_tpu.parallel.sweep import (
    PopulationTrainer, run_work_queue, stack_trees, unstack_tree,
)
from fiude_tpu.train import TRAINING_INFO
from fiude_tpu.utils.config import ExperimentConfig, grid, REGION_INFO
from fiude_tpu.utils.ledger import Ledger
from fiude_tpu.utils.results import evaluate_forecast, upsert_results_row


class TestLedger:
    def test_claim_mark_cycle(self, tmp_path):
        led = Ledger(str(tmp_path / "started.txt"))
        assert led.claim("US/CONN/2016_")
        assert not led.claim("US/CONN/2016_")  # double-claim rejected
        assert led.status("US/CONN/2016_") == "claimed"
        led.mark("US/CONN/2016_", "finished")
        assert led.status("US/CONN/2016_") == "finished"
        assert led.claim("US/UONN/2016_")
        led.mark("US/UONN/2016_", "failed")
        assert led.status("US/UONN/2016_") == "failed"

    def test_prefix_keys_are_distinct(self, tmp_path):
        """Delimiter matching: one key prefixing another must not collide
        (the reference's ``save_name in t`` test at run_ode.py:109-119 would
        treat cfg1 as claimed once cfg10 is)."""
        led = Ledger(str(tmp_path / "started.txt"))
        assert led.claim("US/CONN/cfg10")
        assert led.claim("US/CONN/cfg1")       # not shadowed by cfg10
        assert not led.claim("US/CONN/cfg10")  # but exact re-claim rejected
        led.mark("US/CONN/cfg1", "finished")
        assert led.status("US/CONN/cfg1") == "finished"
        assert led.status("US/CONN/cfg10") == "claimed"  # mark didn't leak

    def test_superstring_keys_are_distinct(self, tmp_path):
        led = Ledger(str(tmp_path / "started.txt"))
        led.claim("weights/US/CONN/2016_e140_")
        # a key that is a substring of an existing line is its own work unit
        assert led.claim("US/CONN/2016_e140_")


class TestResults:
    def test_upsert_creates_and_updates(self, tmp_path):
        fn = str(tmp_path / "results_table")
        upsert_results_row(fn, {"region": "US", "num": 1}, {"2016 34": 1.5})
        upsert_results_row(fn, {"region": "US", "num": 2}, {"2016 34": 2.5})
        upsert_results_row(fn, {"region": "US", "num": 1}, {"2016 41": 3.5})
        df = pd.read_csv(fn + ".csv", index_col=0)
        assert len(df) == 2
        row = df[df["num"] == 1]
        assert float(row["2016 34"].iloc[0]) == 1.5
        assert float(row["2016 41"].iloc[0]) == 3.5

    def test_evaluate_forecast_keys(self):
        rng = np.random.default_rng(0)
        B, S, T, R, w = 4, 16, 40, 2, 10
        y_pred = rng.standard_normal((B, S, T, R)).astype(np.float32)
        y_test = rng.standard_normal((B, T, R)).astype(np.float32)
        out = evaluate_forecast(y_pred, y_test, np.ones(R), window_size=w,
                                test_season=2016)
        assert set(out) == {"2016 16", "2016 23", "2016 30", "2016 37",
                            "skill 2016 7", "skill 2016 14", "skill 2016 21",
                            "skill 2016 28"}
        assert all(np.isfinite(v) for v in out.values())


class TestConfigs:
    def test_grid_product(self):
        cfgs = grid(region=["US", "hhs"], num=[1, 2, 3])
        assert len(cfgs) == 6
        assert len({c.key for c in cfgs}) == 6

    def test_region_presets(self):
        assert REGION_INFO["state"]["n_regions"] == 49
        cfg = ExperimentConfig(region="hhs", ode_name="UONN")
        kw = cfg.model_kwargs()
        assert kw["n_regions"] == 10 and kw["n_qs"] == 15
        model = UDEForecaster.build(**kw)
        assert model.ode.ode_type == "FaFp"


class TestWorkQueue:
    def test_queue_with_failures(self, tmp_path):
        led = Ledger(str(tmp_path / "started.txt"))
        cfgs = grid(num=[1, 2, 3, 4])

        def worker(cfg):
            if cfg.num == 3:
                raise RuntimeError("boom")
            return {"score": cfg.num * 1.0}

        results = run_work_queue(cfgs, worker, ledger=led)
        assert [r["score"] if r else None for r in results] == [1.0, 2.0, None, 4.0]
        assert led.status(cfgs[2].key) == "failed"
        # a second pass skips everything (crash-resume semantics)
        results2 = run_work_queue(cfgs, worker, ledger=led)
        assert results2 == [None, None, None, None]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestPopulation:
    def test_population_matches_isolated_members(self):
        x_tr, y_tr, *_ = synthetic_dataset(
            n_regions=1, n_qs=3, window_size=7, gamma=14, lag=5,
            n_seasons=2, season_len=80, seed=0)
        model = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="Fp",
            enc_params={"q_sizes": (12,), "ff_sizes": (8,)},
            ode_params={"net_sizes": (8, 8)})
        mesh = config_mesh(8)
        pop = PopulationTrainer(model, n_members=8,
                                loss_cfg=TRAINING_INFO["CONN"],
                                lr=1e-3, len_tr=32, mesh=mesh, seed=0)
        loader = ArrayLoader(x_tr[:32], y_tr[:32], batch_size=16,
                             shuffle=False, seed=0)
        t = jnp.arange(0, 8, dtype=jnp.float32) / 7.0
        pop.train(loader, t, epochs=2, eval_pts=np.arange(0, 8, 7),
                  n_samples=4)
        losses = pop.epoch_losses()
        assert losses.shape == (8,)
        assert np.all(np.isfinite(losses))
        # members differ (different seeds)
        assert len(np.unique(np.round(losses, 6))) > 1
        p0 = pop.member_params(0)
        p1 = pop.member_params(1)
        diff = jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), p0, p1))
        assert max(diff) > 0

    def test_fused_scan_step_matches_vmap_step(self):
        """The fused-population path (lax.scan over members, each member
        running the Pallas custom_vjp fwd+bwd pair) must produce the same
        states/metrics as the vmapped XLA step on identical inputs."""
        import dataclasses as _dc

        from fiude_tpu.parallel.sweep import make_population_train_step
        from fiude_tpu.train.trainer import TrainState

        M, B, S = 3, 8, 4
        model = UDEForecaster.build(
            n_regions=2, latent_dim=6, n_qs=3, ode_name="FaFp",
            enc_params={"q_sizes": (12,), "ff_sizes": (8,)},
            ode_params={"net_sizes": (8, 8)})
        fused = _dc.replace(model, fused_train=True)
        pop = PopulationTrainer(fused, n_members=M,
                                loss_cfg=TRAINING_INFO["UONN"],
                                lr=1e-3, len_tr=32, seed=0)
        vmap_step = make_population_train_step(
            model, TRAINING_INFO["UONN"], pop.opt, len_tr=32)

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(0, 1, (B, 14, 2 * 4)).astype(np.float32))
        y = jnp.asarray(rng.uniform(0, 1, (B, 2, 2)).astype(np.float32))
        t = jnp.arange(0, 8, 7, dtype=jnp.float32) / 7.0
        eps = jnp.asarray(rng.standard_normal((M, S, B, 2, 5)),
                          jnp.float32)
        rngs = jax.random.split(jax.random.PRNGKey(9), M)
        args = (x, y, t, eps, pop.fa_w, jnp.asarray(4, jnp.int32),
                jnp.asarray(5000.0, jnp.float32), rngs)

        s_fused, m_fused = pop.step_fn(pop.states, *args)
        s_vmap, m_vmap = vmap_step(pop.states, *args)
        for k in m_vmap:
            np.testing.assert_allclose(np.asarray(m_fused[k]),
                                       np.asarray(m_vmap[k]),
                                       rtol=5e-4, atol=1e-5, err_msg=k)
        for a, b in zip(jax.tree.leaves(s_fused.params),
                        jax.tree.leaves(s_vmap.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)
        assert isinstance(s_fused, TrainState)

    def test_stack_unstack_roundtrip(self):
        model = UDEForecaster.build(
            n_regions=1, latent_dim=6, n_qs=3, ode_name="Fp",
            enc_params={"q_sizes": (8,), "ff_sizes": (8,)},
            ode_params={"net_sizes": (8,)})
        ps = [model.init(jax.random.PRNGKey(i)) for i in range(3)]
        stacked = stack_trees(ps)
        back = unstack_tree(stacked, 3)
        same = jax.tree.map(lambda a, b: bool(jnp.all(a == b)), ps[2], back[2])
        assert all(jax.tree.leaves(same))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestPopulationExperiment:
    def test_grouping(self):
        cfgs = grid(region=["US"], num=[1, 2, 3], gamma=[28, 35])
        from fiude_tpu.parallel.sweep import group_configs_for_population
        groups = group_configs_for_population(cfgs)
        assert len(groups) == 2
        assert all(len(g) == 3 for g in groups)
        assert {c.num for c in groups[0]} == {1, 2, 3}

    def test_one_member_population_matches_run_experiment(self, tmp_path):
        """VERDICT item 10: a 1-member population trained with
        run_population_experiment produces the same weights as the
        single-config run_experiment path with the same seed (the member
        PRNG chains mirror build_trainer's seed + cfg.num convention)."""
        import numpy as np
        from fiude_tpu.parallel.sweep import run_population_experiment
        from fiude_tpu.train.experiment import run_experiment
        from fiude_tpu.utils.config import ExperimentConfig, REGION_INFO

        REGION_INFO["tinypar"] = {
            "n_regions": 1, "latent_dim": 6, "n_qs": 3,
            "ode_params": {"net_sizes": (8, 8), "aug_net_sizes": (8, 8)},
            "dec_params": {},
            "enc_params": {"q_sizes": (12,), "ff_sizes": (8,)},
            "epochs": 4,
        }
        try:
            cfg = ExperimentConfig(region="tinypar", ode_name="CONN",
                                   epochs=2, window_size=7, gamma=28,
                                   latent_dim=6, num=3, batch_size=16,
                                   n_samples=4)
            run_experiment(cfg, synthetic=True,
                           weights_root=str(tmp_path / "single"), seed=0)
            run_population_experiment([cfg], synthetic=True,
                                      weights_root=str(tmp_path / "pop"),
                                      seed=0)
            # the PRNG chains, data, batch order and update rules are
            # identical; residual difference is float-level (the vmapped
            # member program fuses reductions differently than the plain
            # one — ~5e-7/epoch measured, compounding over 4 curriculum
            # epochs), so tolerance is loose in float terms but six orders
            # below the O(0.1) divergence a misaligned stream produces
            for part in ("enc", "ode", "dec"):
                a = np.load(str(tmp_path / "single" / "weights"
                                / f"{cfg.key}{part}.npz"))
                b = np.load(str(tmp_path / "pop" / "weights"
                                / f"{cfg.key}{part}.npz"))
                assert set(a.files) == set(b.files)
                for k in a.files:
                    np.testing.assert_allclose(
                        a[k], b[k], rtol=1e-3, atol=1e-4,
                        err_msg=f"{part}/{k} diverges between population "
                                "and single-config training")
        finally:
            REGION_INFO.pop("tinypar", None)

    def test_population_unit_records_results(self, tmp_path):
        from fiude_tpu.parallel.sweep import run_population_experiment
        from fiude_tpu.parallel.mesh import config_mesh
        from fiude_tpu.utils.config import ExperimentConfig, REGION_INFO

        REGION_INFO["tinypop"] = {
            "n_regions": 1, "latent_dim": 6, "n_qs": 3,
            "ode_params": {"net_sizes": (8, 8), "aug_net_sizes": (8, 8)},
            "dec_params": {},
            "enc_params": {"q_sizes": (12,), "ff_sizes": (8,)},
            "epochs": 4,
        }
        try:
            group = [ExperimentConfig(region="tinypop", ode_name="CONN",
                                      epochs=4, window_size=7, gamma=28,
                                      latent_dim=6, num=n, batch_size=16,
                                      n_samples=4)
                     for n in (1, 2)]
            results = run_population_experiment(
                group, synthetic=True, weights_root=str(tmp_path),
                results_file=str(tmp_path / "restab"), mesh=config_mesh(2))
            assert len(results) == 2
            df = pd.read_csv(str(tmp_path / "restab.csv"), index_col=0)
            assert len(df) == 2
            assert set(df["num"]) == {1, 2}
            assert os.path.exists(
                str(tmp_path / "weights" / group[0].key) + "enc.npz")
        finally:
            REGION_INFO.pop("tinypop", None)
