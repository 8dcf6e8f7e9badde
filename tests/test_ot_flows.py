"""Sinkhorn/exact OT, CFM samplers, vector-field nets, ODE integration,
TripleFlowModel end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.config import Config, FlowConfig, apply_overrides
from clip_dplm_tpu.models.flows import (
    OTFlow,
    TripleFlow,
    VectorFieldNet,
    flow_matching_loss,
    sample_location_and_conditional_flow,
)
from clip_dplm_tpu.models.triple_flow_model import TripleFlowModel, compute_all_losses
from clip_dplm_tpu.ops.integrate import integrate
from clip_dplm_tpu.ops.sinkhorn import (
    hungarian_pairing,
    ot_pairing,
    pairwise_sqdist,
    sample_plan,
    sinkhorn,
)


# ---------------------------------------------------------------------------
# sinkhorn / OT
# ---------------------------------------------------------------------------


def test_sinkhorn_marginals(rng):
    x = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(24, 4)).astype(np.float32))
    cost = pairwise_sqdist(x, y)
    plan, f, g = sinkhorn(cost, epsilon=0.1, num_iters=200)
    np.testing.assert_allclose(np.asarray(plan.sum(1)), np.full(16, 1 / 16), atol=2e-3)  # rows converge (last update exactifies cols)
    np.testing.assert_allclose(np.asarray(plan.sum(0)), np.full(24, 1 / 24), atol=1e-4)


def test_sinkhorn_matches_pot_if_available(rng):
    pot = pytest.importorskip("ot")
    x = rng.normal(size=(12, 3)).astype(np.float32)
    y = rng.normal(size=(12, 3)).astype(np.float32)
    cost = np.asarray(pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    plan, _, _ = sinkhorn(jnp.asarray(cost), epsilon=0.2, num_iters=500)
    a = np.full(12, 1 / 12)
    expected = pot.sinkhorn(a, a, cost, reg=0.2)
    np.testing.assert_allclose(np.asarray(plan), expected, atol=1e-4)


def test_sinkhorn_small_epsilon_stable(rng):
    """Log-domain must survive eps where exp(-C/eps) underflows."""
    x = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32) * 10)
    cost = pairwise_sqdist(x, x + 5.0)
    plan, _, _ = sinkhorn(cost, epsilon=0.001, num_iters=300)
    assert np.isfinite(np.asarray(plan)).all()
    np.testing.assert_allclose(float(plan.sum()), 1.0, atol=5e-3)  # slow convergence at tiny eps; the point is finiteness


def test_hungarian_identity(rng):
    x = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    # cost minimized by identity matching when y == x
    idx = hungarian_pairing(pairwise_sqdist(x, x))
    np.testing.assert_array_equal(np.asarray(idx), np.arange(10))


def test_hungarian_permutation(rng):
    x = rng.normal(size=(10, 4)).astype(np.float32)
    perm = rng.permutation(10)
    y = x[perm]  # y[i] = x[perm[i]] -> best match of x[j] is where perm[i]==j
    idx = np.asarray(hungarian_pairing(pairwise_sqdist(jnp.asarray(x), jnp.asarray(y))))
    np.testing.assert_array_equal(perm[idx], np.arange(10))


def test_ot_pairing_under_jit(rng):
    """Host-callback Hungarian must work inside jit."""
    x0 = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    x1 = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))

    @jax.jit
    def f(x0, x1):
        return ot_pairing(jax.random.PRNGKey(0), x0, x1, method="exact")

    idx = np.asarray(f(x0, x1))
    assert sorted(idx.tolist()) == list(range(8))  # a permutation


def test_sample_plan_prefers_high_mass(rng):
    plan = jnp.asarray(np.array([[0.99, 0.01], [0.01, 0.99]], np.float32))
    idx = sample_plan(jax.random.PRNGKey(0), plan)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1])


# ---------------------------------------------------------------------------
# CFM sampling
# ---------------------------------------------------------------------------


def test_cfm_exact_ot_statistics(rng):
    x0 = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
    x1 = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32) + 3.0)
    t, xt, ut = sample_location_and_conditional_flow(
        jax.random.PRNGKey(0), x0, x1, flow_type="exact_ot", sigma=0.01
    )
    assert t.shape == (32,) and xt.shape == (32, 8) and ut.shape == (32, 8)
    # ut = x1_paired - x0: mean displacement ~ +3 per dim
    np.testing.assert_allclose(float(ut.mean()), 3.0, atol=0.5)
    # xt interpolates: within the hull plus noise
    assert np.isfinite(np.asarray(xt)).all()


def test_cfm_sb_variance_profile(rng):
    """SB noise is sigma*sqrt(t(1-t)): zero at endpoints."""
    x0 = jnp.zeros((512, 4))
    x1 = jnp.zeros((512, 4))
    t, xt, ut = sample_location_and_conditional_flow(
        jax.random.PRNGKey(1), x0, x1, flow_type="sb", sigma=1.0,
        sinkhorn_iters=5,
    )
    tt = np.asarray(t)
    spread = np.abs(np.asarray(xt)).mean(axis=1)
    near_mid = spread[(tt > 0.4) & (tt < 0.6)].mean()
    near_end = spread[(tt < 0.05) | (tt > 0.95)].mean()
    assert near_mid > near_end


@pytest.mark.slow
def test_flow_training_reduces_loss(rng):
    """OTFlow learns the straight-line field between two Gaussians."""
    cfg = FlowConfig(latent_dim=8, hidden_dim=64, n_layers=2,
                     flow_type="independent", sigma=0.05)
    flow = OTFlow(cfg=cfg)
    x0 = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    x1 = x0 + 2.0  # deterministic shift -> ut = 2 everywhere
    params = flow.init(
        {"params": jax.random.PRNGKey(0)}, jax.random.PRNGKey(1), x0, x1
    )

    import optax

    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        def lf(p):
            out = flow.apply(p, key, x0, x1)
            return flow_matching_loss(out["v"], out["ut"])

        l, g = jax.value_and_grad(lf)(params)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(params, u), opt, l

    key = jax.random.PRNGKey(2)
    first = None
    for i in range(60):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, sub)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.3, (first, float(loss))


# ---------------------------------------------------------------------------
# integration
# ---------------------------------------------------------------------------


def test_integrate_linear_field():
    """dx/dt = 1 -> x(1) = x0 + 1, all methods."""
    x0 = jnp.zeros((4, 3))
    for method in ("euler", "heun", "rk4"):
        xf, traj = integrate(lambda x, t: jnp.ones_like(x), x0, method=method)
        np.testing.assert_allclose(np.asarray(xf), 1.0, rtol=1e-5)
        assert traj.shape == (51, 4, 3)


def test_integrate_exponential_accuracy():
    """dx/dt = x: heun/rk4 beat euler on e^1."""
    x0 = jnp.ones((1, 1))
    errs = {}
    for method in ("euler", "heun", "rk4"):
        xf, _ = integrate(lambda x, t: x, x0, num_steps=20, method=method,
                          return_trajectory=False)
        errs[method] = abs(float(xf[0, 0]) - np.e)
    assert errs["rk4"] < errs["heun"] < errs["euler"]


# ---------------------------------------------------------------------------
# TripleFlowModel end-to-end
# ---------------------------------------------------------------------------


def _tfm_batch(rng, n_nodes=12):
    gene_dim = 20
    edges = 24
    return {
        "gene_expr": jnp.asarray(rng.normal(size=(n_nodes, gene_dim)).astype(np.float32)),
        "dpt": jnp.asarray(rng.random(n_nodes).astype(np.float32)),
        "edge_index": jnp.asarray(
            rng.integers(0, n_nodes, (2, edges)).astype(np.int32)),
        "batch_idx": jnp.zeros(n_nodes, jnp.int32),
        "pert_esm": jnp.asarray(rng.normal(size=(n_nodes, 48)).astype(np.float32)),
        "pert_values": jnp.asarray(rng.normal(size=(n_nodes, 10)).astype(np.float32)),
        "protein_emb_raw": jnp.asarray(rng.normal(size=(n_nodes, 64)).astype(np.float32)),
    }


def _tfm_cfg():
    return apply_overrides(
        Config(),
        [
            "encoders.latent_dim=16", "encoders.gene_dim=20",
            "encoders.esm_dim=48", "encoders.protein_hidden_dims=[32]",
            "encoders.gnn.num_layers=1", "encoders.gnn.num_heads=2",
            "flow.latent_dim=16", "flow.hidden_dim=32", "flow.n_layers=1",
            "flow.flow_type=independent",
        ],
    )


@pytest.mark.slow
def test_triple_flow_model_forward_and_losses(rng):
    cfg = _tfm_cfg()
    model = TripleFlowModel(cfg=cfg)
    batch = _tfm_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jax.random.PRNGKey(1), batch
    )
    out = model.apply(variables, jax.random.PRNGKey(2), batch)
    assert set(out["embeddings"]) == {"cell_emb", "pert_emb", "protein_emb"}
    assert set(out["flows"]) == {"cell_to_pert", "cell_to_protein", "pert_to_protein", "cell_to_cell"}
    loss, metrics = compute_all_losses(out, cfg)
    assert np.isfinite(float(loss))
    assert "flow_cell_to_protein" in metrics and "loss_cell_emb_pert_emb" in metrics


def test_generation_api(rng):
    """The integration-test interface: encode two cell states, flow between
    them, map trajectory into protein space."""
    cfg = _tfm_cfg()
    model = TripleFlowModel(cfg=cfg)
    batch = _tfm_batch(rng)
    variables = jax.jit(lambda k0, k1, b: model.init({"params": k0}, k1, b))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), batch
    )

    emb = jax.jit(
        lambda v, b: model.apply(v, b, method=model.encode)
    )(variables, batch)["cell_emb"]
    xf, traj = jax.jit(
        lambda v, e: model.apply(v, e, e, method=model.generate_cell_trajectory)
    )(variables, emb)
    assert traj.shape[0] == 51 and traj.shape[1:] == emb.shape
    xp, ptraj = jax.jit(
        lambda v, e: model.apply(v, e, method=model.generate_protein_from_cell)
    )(variables, emb)
    assert xp.shape == emb.shape
    assert np.isfinite(np.asarray(ptraj)).all()
