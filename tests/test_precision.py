"""Precision-policy wiring: the task path (config_from_yaml) must default to
bf16 compute like the reference's apex O1 default
(reference configs/xfm-pt/Pretrain_XBrain_base_4m.yaml:118), and
`bf16_params: true` must give live-bf16 params with an fp32 master copy
(reference accelerators/apex_ddp_accelerator.py:81-107)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfm_tpu.core.mesh import make_mesh
from xfm_tpu.core.precision import policy_from_config
from xfm_tpu.models import config_from_yaml


def test_default_compute_is_bf16(monkeypatch):
    monkeypatch.delenv("XFM_COMPUTE_DTYPE", raising=False)
    cfg = config_from_yaml({})
    assert cfg.dtype == jnp.bfloat16
    assert cfg.vision.dtype == jnp.bfloat16
    assert cfg.text.dtype == jnp.bfloat16
    assert cfg.fusion.dtype == jnp.bfloat16


def test_policy_precedence(monkeypatch):
    monkeypatch.delenv("XFM_COMPUTE_DTYPE", raising=False)
    # accelerator O0 → fp32 (reference FP16_OPT_LEVEL semantics)
    assert config_from_yaml(
        {"accelerator": {"FP16_OPT_LEVEL": "O0"}}).dtype == jnp.float32
    # explicit YAML key
    assert config_from_yaml({"compute_dtype": "float32"}).dtype == jnp.float32
    # env (the CPU test harness uses this)
    monkeypatch.setenv("XFM_COMPUTE_DTYPE", "float32")
    assert config_from_yaml({}).dtype == jnp.float32
    assert policy_from_config({}).compute_dtype == jnp.float32
    # explicit YAML key beats env
    assert config_from_yaml({"compute_dtype": "bfloat16"}).dtype == jnp.bfloat16


def test_bf16_params_master_weights(tmp_path):
    from xfm_tpu.tasks.common import TaskContext, maybe_bf16_params
    from xfm_tpu.train.optim import create_optimizer_from_config
    from xfm_tpu.train.train_state import TrainState

    sched = lambda step: 0.1  # noqa: E731
    params = {"dense": {"kernel": jnp.asarray(
        np.random.RandomState(0).randn(8, 8), jnp.float32),
        "bias": jnp.zeros((8,), jnp.float32)}}
    cfg = {"bf16_params": True}
    tx0 = create_optimizer_from_config(params, cfg, sched)
    state = TrainState.create(params, tx0)
    ctx = TaskContext(config=cfg, mesh=make_mesh(jax.devices()[:1]),
                      out_dir=str(tmp_path))
    state = maybe_bf16_params(ctx, state, sched)

    # live params bf16; master copy is the exact fp32 originals
    assert state.params["dense"]["kernel"].dtype == jnp.bfloat16
    master = state.opt_state["master"]
    assert master["dense"]["kernel"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(master["dense"]["kernel"]),
                                  np.asarray(params["dense"]["kernel"]))

    # one update: live params track the bf16-rounded master to ≤1 ulp (the
    # delta-add rounds once more; bounded, non-accumulating)
    grads = jax.tree.map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads)
    new_master = state.opt_state["master"]
    np.testing.assert_allclose(
        np.asarray(state.params["dense"]["kernel"], np.float32),
        np.asarray(new_master["dense"]["kernel"].astype(jnp.bfloat16),
                   np.float32), rtol=2 ** -7)


@pytest.mark.parametrize("bf16", [False, True])
@pytest.mark.slow
def test_tiny_pretrain_step_under_policy(bf16):
    """A pretrain loss step runs finite in both compute dtypes through the
    YAML→config path (the round-1 gap: tasks always built fp32 models)."""
    from xfm_tpu.models import XFMForPretrain

    ycfg = {"compute_dtype": "bfloat16" if bf16 else "float32",
            "vision_embed_dim": 32, "vision_depth": 2,
            "vision_num_heads": 2, "patch_size": 16, "image_res": 32,
            "text_num_hidden_layers": 2, "fusion_num_hidden_layers": 2,
            "text_hidden_size": 32, "text_num_attention_heads": 2,
            "text_intermediate_size": 64, "text_vocab_size": 128}
    mcfg = config_from_yaml(ycfg, use_contrastive_loss=True,
                            use_matching_loss=True, use_mlm_loss=True)
    assert mcfg.dtype == (jnp.bfloat16 if bf16 else jnp.float32)
    model = XFMForPretrain(mcfg)
    B, T, M = 4, 8, 2
    r = np.random.RandomState(0)
    batch = dict(
        images=jnp.asarray(r.randn(B, 32, 32, 3), jnp.float32),
        text_ids=jnp.asarray(r.randint(3, 127, (B, T)), jnp.int32),
        text_atts=jnp.ones((B, T), jnp.int32),
        text_ids_masked=jnp.asarray(r.randint(3, 127, (B, T)), jnp.int32),
        masked_pos=jnp.tile(jnp.arange(M, dtype=jnp.int32)[None], (B, 1)),
        masked_ids=jnp.asarray(r.randint(3, 127, (B, M)), jnp.int32),
        image_mask=jnp.asarray(r.rand(B, mcfg.vision.num_patches) < 0.3),
    )
    params = model.init({"params": jax.random.PRNGKey(0)}, batch["images"],
                        batch["text_ids"], batch["text_atts"],
                        method=XFMForPretrain.init_all)["params"]
    # params stay fp32 regardless of compute dtype
    leaf = jax.tree.leaves(params)[0]
    assert leaf.dtype == jnp.float32
    out = model.apply({"params": params}, **batch, ret_mim=True,
                      deterministic=True,
                      rngs={"hardneg": jax.random.PRNGKey(1)})
    total = out["loss_itc"] + out["loss_itm"] + out["loss_mlm"] + out["loss_mim"]
    assert np.isfinite(float(total))


def test_task_rng_impl_override():
    """`prng_impl:` YAML key selects the task-loop generator; the CPU default
    stays threefry so existing test streams are unchanged."""
    import jax.random as jr

    from xfm_tpu.tasks.common import TaskContext, task_rng

    ctx = TaskContext(config={}, mesh=None, out_dir="/tmp", seed=7)
    default_key = task_rng(ctx)
    assert str(jr.key_impl(default_key)) == "threefry2x32"  # cpu backend
    ctx_rbg = TaskContext(config={"prng_impl": "rbg"}, mesh=None,
                          out_dir="/tmp", seed=7)
    rbg_key = task_rng(ctx_rbg)
    assert str(jr.key_impl(rbg_key)) == "rbg"
    # the key drives the same downstream API
    a, b = jr.split(rbg_key)
    assert float(jr.uniform(a)) != float(jr.uniform(b))


def test_dropout_rate_config_keys():
    """YAML dropout/droppath overrides reach the tower configs (xfm_tpu
    extension; reference hardcodes 0.1 at models/xfm.py:190 + HF defaults)."""
    from xfm_tpu.models.xfm import config_from_yaml

    c = config_from_yaml({"drop_path_rate": 0.0, "hidden_dropout_prob": 0.0,
                          "attention_probs_dropout_prob": 0.05})
    assert c.vision.drop_path_rate == 0.0
    assert c.text.hidden_dropout_prob == 0.0
    assert c.fusion.attention_probs_dropout_prob == 0.05
    d = config_from_yaml({})
    assert d.vision.drop_path_rate == 0.1
    assert d.text.hidden_dropout_prob == 0.1
