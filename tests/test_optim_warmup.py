"""Linear lr warmup for continuations restored from weights-only artifacts.

Round-4 measured failure this guards against: restoring a converged cata
EDM from the npz artifact and training at lr 3e-4 with cold amsgrad
moments dropped mol_valid 0.92 -> 0.32 within 1000 steps (QUALITY.md
round-4 session 2). Warmup lets the second moments fill before real-size
steps are taken. The reference never needs this (it always trains with a
warm optimizer from scratch, train_edm.py:152-154), so warmup defaults
off and the default optimizer is byte-identical in behavior.
"""

import jax
import jax.numpy as jnp

from gaudi_tpu.train.optim import make_optimizer


def _params():
    return {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}


def _grads():
    return {"w": jnp.full((4, 4), 0.5), "b": jnp.full((4,), -0.25)}


def test_warmup_first_step_is_tiny():
    p, g = _params(), _grads()
    warm = make_optimizer(1e-3, clip=False, warmup_steps=100)
    cold = make_optimizer(1e-3, clip=False, warmup_steps=0)
    su_w, _ = warm.update(g, warm.init(p), p)
    su_c, _ = cold.update(g, cold.init(p), p)
    # step 0 of a 100-step warmup: lr is 0 -> update exactly zero
    assert float(jnp.abs(su_w["w"]).max()) == 0.0
    # without warmup amsgrad takes a full-lr (sign-like) first step
    assert float(jnp.abs(su_c["w"]).max()) > 5e-4


def test_warmup_reaches_full_lr():
    p, g = _params(), _grads()
    opt = make_optimizer(1e-3, clip=False, warmup_steps=5)
    state = opt.init(p)
    last = None
    for _ in range(7):
        last, state = opt.update(g, state, p)
    ref = make_optimizer(1e-3, clip=False, warmup_steps=0)
    rstate = ref.init(p)
    rlast = None
    for _ in range(7):
        rlast, rstate = ref.update(g, rstate, p)
    # past the ramp both use the same lr; updates agree closely (moments
    # differ only through the first 5 scaled steps)
    assert float(jnp.abs(last["w"] - rlast["w"]).max()) < 5e-4


def test_state_tree_shape_identical_with_and_without_warmup():
    # orbax restores checkpoints into a freshly built state template; a
    # warmup leg's checkpoint must restore into a constant-lr leg, so the
    # optax state trees must share their structure exactly.
    p = _params()
    with_w = make_optimizer(1e-3, warmup_steps=500).init(p)
    without = make_optimizer(1e-3, warmup_steps=0).init(p)
    assert (
        jax.tree_util.tree_structure(with_w)
        == jax.tree_util.tree_structure(without)
    )
