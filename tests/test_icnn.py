"""ICNN Brenier potentials: convexity property (Hessian PSD), transport maps,
second-order training (grad of a loss containing grad Psi)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_dplm_tpu.config import ICNNConfig
from clip_dplm_tpu.models.icnn import (
    SingleCellICNN,
    SingleCellTransport,
    TripleTransportMaps,
    icnn_gradient,
    icnn_hessian,
    total_transport_loss,
    transport_cost,
)


def strict_cfg(d=6):
    # use_layer_norm=False: LayerNorm breaks the convexity guarantee
    return ICNNConfig(input_dim=d, hidden_dims=(16, 8), use_layer_norm=False,
                      activation="softplus")


@pytest.mark.slow
def test_icnn_convexity_hessian_psd(rng):
    """With positive z-weights and convex activations, Psi is convex:
    all Hessian eigenvalues >= 0 (the property triple_flow/2_icnn_core.py:213
    computes but never asserts)."""
    cfg = strict_cfg()
    icnn = SingleCellICNN(cfg=cfg)
    x = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    variables = icnn.init(jax.random.PRNGKey(0), x)
    # randomize pos_weights away from zero-init to stress the property
    variables = jax.tree_util.tree_map(
        lambda p: p + 0.3 * jnp.asarray(rng.normal(size=p.shape), p.dtype),
        variables,
    )
    hess = icnn_hessian(icnn, variables, x)
    eigs = np.linalg.eigvalsh(np.asarray(hess))
    assert eigs.min() >= -1e-4, eigs.min()


def test_icnn_convexity_along_lines(rng):
    """Psi((a+b)/2) <= (Psi(a) + Psi(b))/2 (midpoint convexity)."""
    cfg = strict_cfg()
    icnn = SingleCellICNN(cfg=cfg)
    a = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32))
    variables = icnn.init(jax.random.PRNGKey(0), a)
    variables = jax.tree_util.tree_map(
        lambda p: p + 0.3 * jnp.asarray(rng.normal(size=p.shape), p.dtype),
        variables,
    )
    pa = np.asarray(icnn.apply(variables, a))[:, 0]
    pb = np.asarray(icnn.apply(variables, b))[:, 0]
    pm = np.asarray(icnn.apply(variables, (a + b) / 2))[:, 0]
    assert (pm <= (pa + pb) / 2 + 1e-5).all()


@pytest.mark.slow
def test_icnn_gradient_shape_and_clip(rng):
    cfg = ICNNConfig(input_dim=6, hidden_dims=(16, 8), gradient_clip=0.1)
    icnn = SingleCellICNN(cfg=cfg)
    x = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32) * 100)
    variables = icnn.init(jax.random.PRNGKey(0), x)
    g = icnn_gradient(icnn, variables, x, train=True, clip=cfg.gradient_clip)
    assert g.shape == (4, 6)
    norms = np.linalg.norm(np.asarray(g), axis=-1)
    assert (norms <= cfg.gradient_clip + 1e-5).all()


def test_transport_cost():
    t = jnp.ones((4, 3))
    tgt = jnp.zeros((4, 3))
    total, metrics = transport_cost(t, tgt, sparsity_weight=0.0)
    np.testing.assert_allclose(float(total), np.sqrt(3.0), rtol=1e-6)
    total2, m2 = transport_cost(t, tgt, sparsity_weight=0.1)
    assert float(total2) > float(total)
    assert float(m2["sparsity_cost"]) > 0


@pytest.mark.slow
def test_single_cell_transport_training_mode(rng):
    cfg = ICNNConfig(input_dim=8, hidden_dims=(16, 8))
    tr = SingleCellTransport(cfg=cfg, input_dim=8, output_dim=8)
    src = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
    variables = tr.init(jax.random.PRNGKey(0), src, tgt, train=True)
    out = tr.apply(variables, src, tgt, train=True)
    assert out["transported"].shape == (8, 8)
    assert np.isfinite(float(out["cost"]))


@pytest.mark.slow
def test_second_order_training_reduces_transport_cost(rng):
    """Training grad flows THROUGH grad Psi (double backprop) — the reference's
    hardest numerical path (triple_flow/2_icnn_core.py:181-211 under AMP)."""
    import optax

    cfg = ICNNConfig(input_dim=4, hidden_dims=(16, 8), sparsity_weight=0.0)
    tr = SingleCellTransport(cfg=cfg, input_dim=4, output_dim=4)
    src = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32) + 1.5)
    variables = tr.init(jax.random.PRNGKey(0), src, tgt, train=True)
    tx = optax.adam(5e-3)
    opt = tx.init(variables)

    @jax.jit
    def step(variables, opt):
        def lf(v):
            return tr.apply(v, src, tgt, train=True)["cost"]

        l, g = jax.value_and_grad(lf)(variables)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(variables, u), opt, l

    first = None
    for _ in range(40):
        variables, opt, loss = step(variables, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.8, (first, float(loss))


def test_triple_transport_maps_and_consistency(rng):
    cfg = ICNNConfig(input_dim=8, hidden_dims=(16, 8))
    maps = TripleTransportMaps(cfg=cfg, cell_dim=8, pert_dim=8, protein_dim=8)
    cell = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    pert = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    prot = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    variables = maps.init(jax.random.PRNGKey(0), cell, pert, prot, train=True)
    out = maps.apply(variables, cell, pert, prot, train=True)
    assert set(out) == {
        "cell_to_pert", "cell_to_protein", "pert_to_protein", "consistency_loss"
    }
    total, metrics = total_transport_loss(out, consistency_weight=0.1)
    assert np.isfinite(float(total))
    assert "consistency" in metrics

    # modality dropping: no pert -> no pert maps, no consistency
    out2 = maps.apply(variables, cell, None, prot, train=True)
    assert set(out2) == {"cell_to_protein"}
