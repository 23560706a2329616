"""Pipeline parallelism as a product path: the classify task's text-only
ablation consumes `parallel.pipe` (VERDICT r2 #10) — the text tower stages
over the pipe mesh axis via core.pipeline GPipe. Pins (a) numerical
equivalence of the pipelined classifier forward with TextClassifier.apply,
(b) the end-to-end task run on a pipe2 x data4 CPU mesh, (c) the guard that
other configs still reject pipe > 1."""
import json
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from xfm_tpu.core.mesh import make_mesh
from xfm_tpu.models.task_models import TextClassifier
from xfm_tpu.models.text_encoder import TextConfig


def _tcfg(layers=2):
    return TextConfig.roberta_base(
        vocab_size=64, hidden_size=32, num_hidden_layers=layers,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, fusion_layer=layers, encoder_width=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


@pytest.mark.slow
def test_pipelined_classifier_matches_plain_forward(eight_devices):
    from xfm_tpu.core.pipeline import pipelined_tower_forward
    from xfm_tpu.models.xfm import MLPHead

    cfg = _tcfg()
    model = TextClassifier(cfg, num_labels=3)
    r = np.random.RandomState(0)
    ids = jnp.asarray(r.randint(3, 63, (8, 10)), jnp.int32)
    atts = jnp.ones((8, 10), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        text_ids=ids, text_atts=atts,
                        method=TextClassifier.init_all)["params"]
    plain = model.apply({"params": params}, text_ids=ids, text_atts=atts,
                        train=False)

    mesh = make_mesh(eight_devices, data=4, fsdp=1, tensor=1, pipe=2)
    head = MLPHead(3)
    with mesh:
        # mb = B/M = 4 rows per microbatch, sharded 4-way over 'data'
        hidden = pipelined_tower_forward(params["text_encoder"], cfg, ids,
                                         atts, mesh, num_microbatches=2,
                                         data_axes=("data",))
    piped = head.apply({"params": params["cls_head"]}, hidden[:, 0, :])
    np.testing.assert_allclose(np.asarray(piped), np.asarray(plain),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_classify_text_ablation_pipelined_end_to_end(tmp_path):
    rows = [{"text": f"sample number {i}", "label": i % 2}
            for i in range(8)]
    (tmp_path / "t.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows))
    cfg = dict(
        text_encoder="roberta-base", text_num_hidden_layers=2,
        text_fusion_start_at=2, fusion_num_hidden_layers=2,
        fusion_fusion_start_at=0, text_hidden_size=32,
        text_num_attention_heads=2, text_intermediate_size=64,
        image_res=32, patch_size=16, vision_embed_dim=32, vision_depth=1,
        vision_num_heads=2, embed_dim=16,
        train_file=str(tmp_path / "t.jsonl"),
        val_file=str(tmp_path / "t.jsonl"), num_labels=2,
        batch_size=8, max_tokens=10, use_text_classifier=True,
        parallel={"pipe": 2, "data": 4, "microbatches": 2},
        schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                   "num_warmup_steps": 0},
        optimizer={"lr": 1e-3, "weight_decay": 0.01})
    cfg_path = tmp_path / "c.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import classify

    args = types.SimpleNamespace(config=str(cfg_path),
                                 output_dir=str(tmp_path / "out"),
                                 checkpoint=None, evaluate=False, bs=None,
                                 epoch=None, seed=0)
    metrics = classify.main(args)
    assert 0.0 <= metrics["best_acc"] <= 1.0


def test_multimodal_classify_still_rejects_pipe(tmp_path):
    rows = [{"text": "a", "image": "x.png", "label": 0}]
    (tmp_path / "t.jsonl").write_text(json.dumps(rows[0]))
    cfg = dict(
        text_encoder="roberta-base", text_num_hidden_layers=2,
        text_fusion_start_at=2, fusion_num_hidden_layers=2,
        fusion_fusion_start_at=0, text_hidden_size=32,
        text_num_attention_heads=2, text_intermediate_size=64,
        image_res=32, patch_size=16, vision_embed_dim=32, vision_depth=1,
        vision_num_heads=2, embed_dim=16,
        train_file=str(tmp_path / "t.jsonl"), num_labels=2,
        parallel={"pipe": 2})
    cfg_path = tmp_path / "c.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import classify

    args = types.SimpleNamespace(config=str(cfg_path),
                                 output_dir=str(tmp_path / "out"),
                                 checkpoint=None, evaluate=False, bs=None,
                                 epoch=None, seed=0)
    with pytest.raises(ValueError, match="use_text_classifier"):
        classify.main(args)


def test_other_tasks_still_reject_pipe(tmp_path):
    from xfm_tpu.tasks.common import TaskContext

    cfg = dict(parallel={"pipe": 2}, train_file="x")
    cfg_path = tmp_path / "c.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    args = types.SimpleNamespace(config=str(cfg_path), output_dir=str(
        tmp_path / "out"), bs=None, epoch=None, seed=0)
    with pytest.raises(ValueError, match="pipe"):
        TaskContext.from_args(args)

@pytest.mark.slow
def test_pipelined_dropout_threads_per_stage_keys(eight_devices):
    """dropout_rng enables real dropout inside the pipeline (VERDICT r3 #10):
    same rng reproduces, different rngs differ, and prob=0 with an rng still
    matches the deterministic path exactly."""
    from xfm_tpu.core.pipeline import pipelined_tower_forward

    import dataclasses
    cfg = dataclasses.replace(_tcfg(), hidden_dropout_prob=0.5)
    model = TextClassifier(cfg, num_labels=3)
    r = np.random.RandomState(1)
    ids = jnp.asarray(r.randint(3, 63, (8, 10)), jnp.int32)
    atts = jnp.ones((8, 10), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        text_ids=ids, text_atts=atts,
                        method=TextClassifier.init_all)["params"]
    mesh = make_mesh(eight_devices, data=4, fsdp=1, tensor=1, pipe=2)

    def fwd(rng, c=cfg):
        with mesh:
            return np.asarray(pipelined_tower_forward(
                params["text_encoder"], c, ids, atts, mesh,
                num_microbatches=2, data_axes=("data",), dropout_rng=rng))

    a = fwd(jax.random.PRNGKey(7))
    b = fwd(jax.random.PRNGKey(7))
    c = fwd(jax.random.PRNGKey(8))
    det = fwd(None)
    np.testing.assert_array_equal(a, b)       # reproducible per key
    assert np.abs(a - c).max() > 1e-6         # fresh key, fresh masks
    assert np.abs(a - det).max() > 1e-6       # dropout actually applied
    # prob=0 + an rng is exactly the deterministic path
    cfg0 = _tcfg()
    np.testing.assert_array_equal(
        fwd(jax.random.PRNGKey(9), c=cfg0), fwd(None, c=cfg0))
    # gradient flows through the dropout path
    def loss(p):
        with mesh:
            h = pipelined_tower_forward(p, cfg, ids, atts, mesh,
                                        num_microbatches=2,
                                        data_axes=("data",),
                                        dropout_rng=jax.random.PRNGKey(3))
        return jnp.mean(h ** 2)

    g = jax.grad(loss)(params["text_encoder"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
