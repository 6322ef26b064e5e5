"""test-tube HyperOptArgumentParser shim (cli/hyperopt.py, SURVEY.md §5.6).

The reference's scripts declare grid dimensions via
`HyperOptArgumentParser.opt_list(..., options=[...], tunable=True)`
(/root/reference/src/autoencoder/autoencoder.py:161-182) and enumerate trials
with `hyperparams.trials(N)`. These tests pin that surface.
"""
import argparse

import pytest

from driving_dirty_tpu.cli.hyperopt import (HyperOptArgumentParser, TTNamespace,
                                            enumerate_trials, opt_list, tune)


def _parser():
    p = HyperOptArgumentParser(strategy="grid_search")
    p.opt_list("--lr", type=float, default=1e-3,
               options=[1e-3, 1e-4], tunable=True)
    p.opt_list("--latent", type=int, default=128,
               options=[64, 128, 256], tunable=True)
    p.opt_list("--not_tuned", type=int, default=5, options=[5, 6], tunable=False)
    p.add_argument("--plain", type=str, default="x")
    return p


def test_grid_enumeration_order_and_truncation():
    p = _parser()
    grid = p.grid(None)
    assert len(grid) == 6  # 3 latent x 2 lr, sorted-dest cross product
    assert grid[0] == {"latent": 64, "lr": 1e-3}
    assert grid[1] == {"latent": 64, "lr": 1e-4}
    assert p.grid(2) == grid[:2]
    # non-tunable / plain args never become dimensions
    assert all(set(g) == {"latent", "lr"} for g in grid)


def test_parse_args_namespace_trials():
    p = _parser()
    hparams = p.parse_args(["--plain", "y"])
    assert isinstance(hparams, TTNamespace)
    assert hparams.plain == "y" and hparams.not_tuned == 5
    trials = hparams.trials(4)  # test-tube: hyperparams.trials(N)
    assert len(trials) == 4
    assert [(t.latent, t.lr) for t in trials] == [
        (64, 1e-3), (64, 1e-4), (128, 1e-3), (128, 1e-4)]
    # trial namespaces keep the non-tuned values
    assert all(t.plain == "y" for t in trials)
    # parsing an explicit value doesn't remove the dimension
    assert p.parse_args(["--lr", "0.5"]).lr == 0.5


def test_random_search_is_seeded():
    p = HyperOptArgumentParser(strategy="random_search")
    p.opt_list("--a", type=int, default=0, options=list(range(100)), tunable=True)
    g1, g2 = p.grid(5), p.grid(5)
    assert g1 == g2  # deterministic across calls
    assert len(g1) == 5 and all(set(t) == {"a"} for t in g1)


def test_opt_range_linear_and_log():
    p = HyperOptArgumentParser()
    p.opt_range("--lin", type=float, default=0.0, low=0.0, high=1.0,
                nb_samples=5, tunable=True)
    p.opt_range("--lg", type=float, default=1e-4, low=1e-4, high=1e-1,
                nb_samples=4, log_base=10, tunable=True)
    lin = p.opt_dims["lin"]
    assert lin == [0.0, 0.25, 0.5, 0.75, 1.0]
    lg = p.opt_dims["lg"]
    assert lg[0] == pytest.approx(1e-4) and lg[-1] == pytest.approx(1e-1)
    assert lg[1] == pytest.approx(1e-3) and lg[2] == pytest.approx(1e-2)


def test_helpers_degrade_on_plain_parser():
    p = argparse.ArgumentParser()
    opt_list(p, "--lr", type=float, default=1e-3, options=[1, 2], tunable=True)
    tune(p, "lr", [1, 2])  # no-op, must not raise
    ns = p.parse_args([])
    assert ns.lr == 1e-3
    assert not hasattr(p, "opt_dims")


def test_unknown_strategy_rejected():
    with pytest.raises(ValueError):
        HyperOptArgumentParser(strategy="bayesian")
    assert enumerate_trials({}, 3) == [{}]
