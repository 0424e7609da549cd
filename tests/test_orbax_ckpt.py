"""OrbaxCheckpointManager roundtrip: save/restore/retention/meta
(utils/native_ckpt.py orbax backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tce_rvos_tpu.utils.native_ckpt import OrbaxCheckpointManager



pytestmark = pytest.mark.slow  # full-model compiles: minutes on 1-core CPU

@pytest.fixture()
def tree():
    k = jax.random.PRNGKey(0)
    return {
        "params": {
            "dense": {"kernel": jax.random.normal(k, (8, 4)), "bias": jnp.zeros(4)}
        }
    }


def test_save_restore_roundtrip(tmp_path, tree):
    mgr = OrbaxCheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    opt_state = {"mu": jax.tree.map(jnp.zeros_like, tree)}
    mgr.save(10, tree, opt_state, meta={"epoch": 3, "step": 10})
    mgr.wait()

    template = jax.tree.map(jnp.zeros_like, tree)
    opt_template = jax.tree.map(jnp.zeros_like, opt_state)
    got, got_opt, meta = mgr.restore(template, opt_template)
    np.testing.assert_array_equal(
        np.asarray(got["params"]["dense"]["kernel"]),
        np.asarray(tree["params"]["dense"]["kernel"]),
    )
    assert got_opt is not None
    assert meta.get("epoch") == 3
    mgr.close()


def test_retention_and_latest(tmp_path, tree):
    mgr = OrbaxCheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for step in (1, 2, 3):
        scaled = jax.tree.map(lambda x: x * step, tree)
        mgr.save(step, scaled, meta={"epoch": step})
    mgr.wait()
    assert mgr.manager.latest_step() == 3
    steps = sorted(mgr.manager.all_steps())
    assert steps == [2, 3]  # max_to_keep=2 dropped step 1

    template = jax.tree.map(jnp.zeros_like, tree)
    got, _, _ = mgr.restore(template)  # latest
    np.testing.assert_allclose(
        np.asarray(got["params"]["dense"]["bias"]),
        np.asarray(tree["params"]["dense"]["bias"]) * 3,
    )
    mgr.close()
