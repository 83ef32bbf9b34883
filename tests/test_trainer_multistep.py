"""Multi-step scan training launches are bit-identical to the per-step loop.

The trainer's `steps_per_launch > 1` path fuses K optimizer steps into one
jitted `lax.scan` launch (amortizing per-step host dispatch, which dominates
wall time on remote-attached chips). It must be a pure performance knob:
the scan body carries the PRNG key through the same `split(key, 3)` sequence
as the Python loop, so params, opt state, and the step counter match exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_models import TINY
from uncertainty_nerf_gs_tpu.data.synthetic import make_dataset
from uncertainty_nerf_gs_tpu.engine.trainer import NerfactoTrainer
from uncertainty_nerf_gs_tpu.models.nerfacto import NerfactoConfig


def _fresh_trainer():
    cams, images, _ = make_dataset(4, 24, 24)
    cfg = NerfactoConfig(num_images=4, **TINY)
    return NerfactoTrainer(cfg, cams, images, seed=3)


def _tree_equal(a, b):
    leaves_a, treedef_a = jax.tree.flatten(a)
    leaves_b, treedef_b = jax.tree.flatten(b)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_multistep_matches_per_step_loop():
    t1 = _fresh_trainer()
    losses1 = t1.train(7, num_rays_per_batch=128, steps_per_launch=1)

    t2 = _fresh_trainer()
    losses2 = t2.train(7, num_rays_per_batch=128, steps_per_launch=3)

    assert int(t1.state.step) == int(t2.state.step) == 7
    _tree_equal(t1.state.params, t2.state.params)
    _tree_equal(t1.state.opt_state, t2.state.opt_state)
    for k in losses1:
        np.testing.assert_allclose(losses1[k], losses2[k], rtol=0, atol=0)


def test_gradient_checkpointing_matches_plain_backward():
    """Remat (jax.checkpoint on the model forward) must change memory, not
    math: one train step with and without it produces identical params."""
    cams, images, _ = make_dataset(4, 24, 24)
    cfg = NerfactoConfig(num_images=4, **TINY)
    t_plain = NerfactoTrainer(cfg, cams, images, seed=5)
    t_remat = NerfactoTrainer(
        cfg, cams, images, seed=5, gradient_checkpointing=True
    )
    t_plain.train(2, num_rays_per_batch=128)
    t_remat.train(2, num_rays_per_batch=128)
    leaves_p = jax.tree.leaves(t_plain.state.params)
    leaves_r = jax.tree.leaves(t_remat.state.params)
    for lp, lr in zip(leaves_p, leaves_r):
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(lr), rtol=0, atol=1e-6
        )


def test_multistep_writer_and_callback_cadence():
    records = []

    class W:
        def write(self, step, scalars):
            records.append((step, dict(scalars)))

    seen = []
    t = _fresh_trainer()
    t.train(
        5,
        num_rays_per_batch=128,
        steps_per_launch=5,
        writer=W(),
        callback=lambda i, losses: seen.append(i),
    )
    assert seen == [0, 1, 2, 3, 4]
    # writer fires on i % 10 == 0 and on the final step (loop semantics)
    assert [s for s, _ in records] == [1, 5]
    assert all(np.isfinite(list(r.values())).all() for _, r in records)
