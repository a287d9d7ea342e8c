"""Policy network: shapes, masking, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from img_env_tpu.models.policy import (
    CrowdNavPolicy,
    PolicyConfig,
    example_inputs,
    init_policy,
    sample_action,
)


def test_forward_shapes_continuous():
    cfg = PolicyConfig(max_ped=4, hidden=64, crowd_dim=32)
    model, params = init_policy(jax.random.PRNGKey(0), cfg, batch=5)
    sm, vs, pm, pv = example_inputs(cfg, batch=5)
    mean, log_std, value = model.apply(params, sm, vs, pm, pv)
    assert mean.shape == (5, 2)
    assert log_std.shape == (5, 2)
    assert value.shape == (5,)


def test_forward_discrete_head():
    cfg = PolicyConfig(max_ped=2, discrete_actions=7, hidden=64,
                       use_ped_map=False, use_ped_vec=False)
    model, params = init_policy(jax.random.PRNGKey(0), cfg, batch=3)
    sm, vs, pm, pv = example_inputs(cfg, batch=3)
    logits, value = model.apply(params, sm, vs, pm, pv)
    assert logits.shape == (3, 7)
    act, logp, v = sample_action(jax.random.PRNGKey(1), (logits, value))
    assert act.shape == (3,)
    assert np.all(np.asarray(act) >= 0) and np.all(np.asarray(act) < 7)


def test_ped_mask_ignores_invalid_tokens():
    """Changing masked-out ped tokens must not change the output."""
    cfg = PolicyConfig(max_ped=4, hidden=64, crowd_dim=32)
    model, params = init_policy(jax.random.PRNGKey(0), cfg, batch=1)
    sm, vs, pm, pv = example_inputs(cfg, batch=1)
    pv = pv.at[0, 0].set(2.0)  # 2 valid peds
    pv_a = pv.at[0, 1 : 1 + 14].set(1.0)
    out_a = model.apply(params, sm, vs, pm, pv_a)
    # mutate tokens 2..3 (invalid)
    pv_b = pv_a.at[0, 1 + 14 :].set(99.0)
    out_b = model.apply(params, sm, vs, pm, pv_b)
    np.testing.assert_allclose(np.asarray(out_a[0]), np.asarray(out_b[0]), atol=1e-5)


def test_gradients_flow():
    cfg = PolicyConfig(max_ped=2, hidden=64, crowd_dim=32)
    model, params = init_policy(jax.random.PRNGKey(0), cfg, batch=2)
    sm, vs, pm, pv = example_inputs(cfg, batch=2)

    def loss(p):
        mean, log_std, value = model.apply(p, sm, vs, pm, pv)
        return (mean ** 2).sum() + (value ** 2).sum()

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total)
