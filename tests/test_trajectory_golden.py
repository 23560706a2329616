"""Training-trajectory golden parity (VERDICT r4 #2).

Runs our jitted train loop — create_optimizer 4-group AdamW
(train/optim.py) + linear_warmup_decay (train/schedules.py) — for 6 steps
from the reference's seeded init on the reference's fixed batch, and pins
the per-step loss sequence (and pre-clip gradient norms) against the
reference pipeline recorded in golden_trajectory.npz
(scripts/make_golden_fixtures.py make_trajectory: reference optim.py:4-50
HF AdamW + scheduler.py:6-30 + apex-style clip 1.0,
apex_ddp_accelerator.py:100-110; fine-tune variant is bare AdamW per
Retrieval.py:318-322).

This mechanically catches the optimizer-semantics bug class — group
membership (decay/no-decay name list, lr_mult boost set), schedule
stepping, clip-vs-no-clip, AdamW update math — that forward-only golden
fixtures cannot see (the round-4 grad-clip mismatch was caught only by
reading)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from test_golden_parity import _xfm_losses_config, load_fixture


@pytest.fixture(scope="module")
def traj():
    from xfm_tpu.models.xfm import XFMBase
    from xfm_tpu.train.checkpoint import (import_xfm_checkpoint,
                                          merge_params, to_jax)

    sd, io = load_fixture("golden_trajectory.npz")
    cfg = _xfm_losses_config()
    model = XFMBase(cfg)
    images = jnp.asarray(io["image"].transpose(0, 2, 3, 1))  # NCHW→NHWC
    ids = jnp.asarray(io["ids"], jnp.int32)
    atts = jnp.asarray(io["atts"], jnp.int32)
    init = model.init({"params": jax.random.PRNGKey(0)}, images, ids, atts,
                      method=XFMBase.init_all)["params"]
    imported = to_jax(import_xfm_checkpoint(sd, cfg))["backbone"]
    params, missing, _ = merge_params(init, imported)
    assert not missing, missing
    return model, params, io, images, ids, atts


def _loss_fn(model, io, images, ids, atts, which):
    mask = jnp.asarray(io["mask"])
    ids_masked = jnp.asarray(io["ids_masked"], jnp.int32)
    masked_pos = jnp.asarray(io["masked_pos"], jnp.int32)
    masked_ids = jnp.asarray(io["masked_ids"], jnp.int32)

    def loss(params, neg):
        def compute(m):
            image_embeds = m.get_vision_embeds(images)
            image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
            text_embeds = m.get_text_embeds(ids, atts)
            image_feat, text_feat = m.get_features(image_embeds, text_embeds)
            itc = m.get_contrastive_loss(image_feat, text_feat)
            itm = m.get_matching_loss(
                jax.random.PRNGKey(0), image_embeds, image_atts, image_feat,
                ids, atts, text_feat, text_embeds=text_embeds,
                is_pretrain=True, fixed_negatives=(neg[0], neg[1]))
            if which == "ft":
                return itc + itm
            mlm = m.get_fuse_mlm_loss(ids_masked, atts, image_embeds,
                                      image_atts, masked_pos, masked_ids)
            embeds_masked = m.get_vision_embeds(images, mask=mask)
            mim = m.get_mim_loss(embeds_masked, image_embeds, mask)
            return itc + itm + mlm + mim

        return model.apply({"params": params}, method=compute)

    return loss


def _run(model, params, io, images, ids, atts, which, clip):
    from xfm_tpu.train.optim import create_optimizer
    from xfm_tpu.train.schedules import linear_warmup_decay

    schedule = linear_warmup_decay(float(io["lr"]),
                                   int(io["num_training_steps"]),
                                   int(io["num_warmup_steps"]))
    tx = create_optimizer(params, schedule,
                          weight_decay=float(io["weight_decay"]),
                          lr_mult=float(io["lr_mult"]),
                          clip_grad_norm=clip)
    loss = _loss_fn(model, io, images, ids, atts, which)

    @jax.jit
    def step(params, opt_state, neg):
        val, grads = jax.value_and_grad(loss)(params, neg)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, val, gnorm

    opt_state = tx.init(params)
    negs = jnp.asarray(io["negs"], jnp.int32)
    losses, norms = [], []
    for s in range(negs.shape[0]):
        params, opt_state, val, gnorm = step(params, opt_state, negs[s])
        losses.append(float(val))
        norms.append(float(gnorm))
    return np.asarray(losses), np.asarray(norms)


@pytest.mark.slow
def test_finetune_trajectory_matches_reference(traj):
    """ITC+ITM, bare AdamW (no clip), linear schedule — 6-step loss
    sequence vs the reference pipeline."""
    model, params, io, images, ids, atts = traj
    losses, _ = _run(model, params, io, images, ids, atts, "ft", clip=None)
    # measured residual of the correct pipeline is ~2e-5 relative (f32
    # code-vs-code forward noise amplified over 6 steps); a wrongly-applied
    # clip 1.0 measures 2.8e-4 — the tolerance sits between with margin
    np.testing.assert_allclose(losses, io["ft_losses"], rtol=1e-4,
                               atol=5e-5)
    # the sequence must actually move (first two match because warmup
    # starts the lr at 0 — itself a semantics pin)
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    assert abs(losses[-1] - losses[0]) > 1e-3


@pytest.mark.slow
def test_pretrain_trajectory_matches_reference(traj):
    """ITC+ITM+MLM+MIM with global-norm clip 1.0 — loss sequence AND
    pre-clip gradient norms vs the reference (the recorded norms cross 1.0
    at step 2, so the clip path is genuinely exercised)."""
    model, params, io, images, ids, atts = traj
    losses, norms = _run(model, params, io, images, ids, atts, "pt",
                         clip=1.0)
    np.testing.assert_allclose(losses, io["pt_losses"], rtol=1e-4,
                               atol=5e-5)
    np.testing.assert_allclose(norms, io["pt_grad_norms"], rtol=5e-3,
                               atol=1e-3)
    assert float(np.max(io["pt_grad_norms"])) > 1.0  # clip engaged
