"""Pipeline parallelism: GPipe schedule over the scan-stacked DiT trunk.

The reference has NO pipeline parallelism (DDP only,
``guided_diffusion/dist_util.py:57``) — these tests pin the exceed-
reference guarantee: ``dit_pipeline_apply`` on a dp×pipe mesh is
numerically identical (forward AND gradients) to the plain GSPMD
``model.apply``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from ln3diff_tpu.models.dit import DiT_TriLatent, DiTConfig
from ln3diff_tpu.parallel.pipeline import (dit_pipeline_apply,
                                           pipeline_blocks, split_stages)

pytestmark = pytest.mark.slow


def tiny_dit(depth=4, variant='text'):
    cfg = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                    hidden_size=64, depth=depth, num_heads=2,
                    variant=variant, context_dim=32, dtype=jnp.float32)
    model = DiT_TriLatent(cfg)
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (4, 8, 8, 12))
    t = jnp.arange(4.0)
    ctx = {'crossattn': jax.random.normal(jax.random.PRNGKey(1),
                                          (4, 7, 32))}
    variables = model.init(jax.random.PRNGKey(2), x, t, ctx)
    return model, variables, x, t, ctx


def pipe_mesh(pp, dp=1):
    devs = np.array(jax.devices()[:dp * pp]).reshape(dp, pp)
    return Mesh(devs, ('dp', 'pipe'))


def test_embed_blocks_head_compose_to_call():
    model, variables, x, t, ctx = tiny_dit()
    y = model.apply(variables, x, t, ctx)
    tok, te, c, ca, dn = model.apply(variables, x, t, ctx,
                                     method=model.embed)
    tok = model.apply(variables, tok, c, ca, dn, method=model.run_blocks)
    y2 = model.apply(variables, tok, te, x.shape[:3], method=model.head)
    assert jnp.allclose(y, y2)


@pytest.mark.parametrize('pp,n_micro', [(2, 4), (4, 4), (2, 2)])
def test_pipeline_forward_matches_plain_apply(pp, n_micro):
    model, variables, x, t, ctx = tiny_dit()
    y_ref = model.apply(variables, x, t, ctx)
    y_pp = dit_pipeline_apply(model, variables, x, t, ctx,
                              mesh=pipe_mesh(pp, dp=2), n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               atol=1e-5)


def test_pipeline_pp1_microbatched_path():
    model, variables, x, t, ctx = tiny_dit()
    y_ref = model.apply(variables, x, t, ctx)
    y_pp = dit_pipeline_apply(model, variables, x, t, ctx,
                              mesh=pipe_mesh(1, dp=2), n_micro=2)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               atol=1e-5)


def test_pipeline_gradients_match_plain_apply():
    model, variables, x, t, ctx = tiny_dit(depth=2)
    mesh = pipe_mesh(2, dp=2)

    def loss_pp(v):
        out = dit_pipeline_apply(model, v, x, t, ctx, mesh=mesh,
                                 n_micro=4)
        return jnp.sum(out ** 2)

    def loss_ref(v):
        return jnp.sum(model.apply(v, x, t, ctx) ** 2)

    g_pp = jax.grad(loss_pp)(variables)
    g_ref = jax.grad(loss_ref)(variables)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_ref)):
        scale = float(jnp.abs(b).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-5)


def test_pipeline_remat_matches():
    model, variables, x, t, ctx = tiny_dit(depth=2)
    mesh = pipe_mesh(2)
    y_ref = model.apply(variables, x, t, ctx)
    y_rm = dit_pipeline_apply(model, variables, x, t, ctx, mesh=mesh,
                              n_micro=2, remat=True)
    np.testing.assert_allclose(np.asarray(y_rm), np.asarray(y_ref),
                               atol=1e-5)


def test_pipeline_blocks_generic_mlp():
    """pipeline_blocks drives any stacked-layer chunk fn, not just DiT."""
    depth, pp, B, D = 4, 2, 8, 16
    k = jax.random.PRNGKey(0)
    ws = jax.random.normal(k, (depth, D, D)) / np.sqrt(D)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))

    def chunk(w_local, xb, _):
        def body(xb, w):
            return jnp.tanh(xb @ w), None
        xb, _ = jax.lax.scan(body, xb, w_local)
        return xb

    y_ref = chunk(ws, x, None)
    y_pp = pipeline_blocks(chunk, ws, x, (), mesh=pipe_mesh(pp),
                           n_micro=4)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               atol=1e-5)


def test_split_stages_shapes():
    tree = {'w': jnp.zeros((8, 3, 5))}
    out = split_stages(tree, 4)
    assert out['w'].shape == (4, 2, 3, 5)


def test_ldm_trainer_pp_step_matches_plain():
    """End-to-end: LDMTrainer on a data×pipe mesh takes one FM train
    step whose loss matches the plain data-parallel trainer bitwise-
    closely (same seed ⇒ same init, same rng ⇒ same noise draw)."""
    from ln3diff_tpu.parallel.mesh import MeshConfig, make_mesh
    from ln3diff_tpu.training.ldm_trainer import LDMTrainConfig, LDMTrainer

    cfg = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                    hidden_size=64, depth=4, num_heads=2, variant='text',
                    context_dim=32, dtype=jnp.float32)
    batch = {
        'latent': jax.random.normal(jax.random.PRNGKey(5), (8, 8, 8, 12)),
        'context': {'crossattn': jax.random.normal(
            jax.random.PRNGKey(6), (8, 7, 32))},
    }

    losses = {}
    for name, mesh_cfg, n_dev in (
            ('plain', MeshConfig(data=4), 4),
            ('pp', MeshConfig(data=2, pipe=2), 4)):
        trainer = LDMTrainer(
            DiT_TriLatent(cfg),
            LDMTrainConfig(objective='flow_matching', lr=1e-4,
                           pp_microbatches=2, log_interval=10**9),
            mesh=make_mesh(mesh_cfg, devices=jax.devices()[:n_dev]),
            seed=0)
        assert trainer._use_pp == (name == 'pp')
        trainer.build(batch)
        _, metrics = trainer._step_fn(trainer._state, batch,
                                      jax.random.PRNGKey(7))
        losses[name] = float(metrics['loss'])
    np.testing.assert_allclose(losses['pp'], losses['plain'], rtol=1e-5)


def test_pipeline_parallel_rules_shard_trunk():
    from ln3diff_tpu.parallel.mesh import (MeshConfig, make_mesh,
                                           pipeline_parallel_rules)

    model, variables, *_ = tiny_dit(depth=4)
    mesh = make_mesh(MeshConfig(data=2, pipe=2),
                     devices=jax.devices()[:4])
    rules = pipeline_parallel_rules(variables['params'], mesh)
    trunk = rules['blocks']['block']
    for s in jax.tree_util.tree_leaves(
            trunk, is_leaf=lambda x: hasattr(x, 'spec')):
        assert s.spec[0] == 'pipe', s
    head = rules['final_layer']
    for s in jax.tree_util.tree_leaves(
            head, is_leaf=lambda x: hasattr(x, 'spec')):
        assert 'pipe' not in jax.tree_util.tree_leaves(tuple(s.spec)), s


def test_pixelart_variant_pipeline():
    """Shared-adaLN (PixArt) conditioning rides the broadcast ctx leg."""
    model, variables, x, t, ctx = tiny_dit(variant='pixelart-text')
    y_ref = model.apply(variables, x, t, ctx)
    y_pp = dit_pipeline_apply(model, variables, x, t, ctx,
                              mesh=pipe_mesh(2), n_micro=2)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               atol=1e-5)
