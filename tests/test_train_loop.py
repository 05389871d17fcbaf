"""Training-loop driver: checkpoint/resume reproduces the uninterrupted run."""

import argparse

import numpy as np
import pytest

import jax


def _args(tmp_path, steps, resume=False):
    return argparse.Namespace(
        steps=steps, batch=4, dp=2, tp=1, seed=0,
        ckpt_dir=str(tmp_path / "ckpt"), save_every=3, log_every=1,
        data_dir=None, resume=resume)


def test_train_resume_matches_uninterrupted(tmp_path):
    from tools.train import run

    # uninterrupted: 5 steps
    t5, _, _ = run(_args(tmp_path / "a", 5))
    # interrupted: 3 steps (saves at 3), then resume to 5
    run(_args(tmp_path / "b", 3))
    t_resumed, _, _ = run(_args(tmp_path / "b", 5, resume=True))

    la = jax.tree_util.tree_leaves(t5)
    lb = jax.tree_util.tree_leaves(t_resumed)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)
