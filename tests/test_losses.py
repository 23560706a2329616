"""Loss-function unit tests against hand-computed / torch-checked values."""
import numpy as np
import jax
import jax.numpy as jnp

from xfm_tpu.models import losses
from xfm_tpu.models.text_encoder import cross_entropy, per_sample_lm_loss


def test_contrastive_loss_identity():
    # orthonormal features, temp=1: logits = I → loss = -log softmax diag
    f = jnp.eye(4, 8)
    loss = losses.contrastive_loss(f, f, jnp.asarray(1.0))
    expected = -np.log(np.exp(1.0) / (np.exp(1.0) + 3 * np.exp(0.0)))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_contrastive_loss_idx_duplicates():
    f = jnp.eye(4, 8)
    idx = jnp.array([0, 0, 1, 2])  # first two are the same image
    loss = losses.contrastive_loss(f, f, jnp.asarray(1.0), idx=idx)
    assert np.isfinite(float(loss))
    # duplicate-aware loss ≤ naive loss is not guaranteed, just sanity:
    assert float(loss) > 0


def test_hard_negative_never_selects_positive():
    rng = jax.random.PRNGKey(0)
    f = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    for seed in range(5):
        img_neg, txt_neg = losses.hard_negative_indices(
            jax.random.PRNGKey(seed), f, f, jnp.asarray(0.07))
        assert not np.any(np.asarray(img_neg) == np.arange(16))
        assert not np.any(np.asarray(txt_neg) == np.arange(16))


def test_mim_mse_matches_naive():
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randn(2, 5, 4).astype(np.float32))
    tgt = jnp.asarray(rng.randn(2, 5, 4).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 0, 1, 0], [0, 1, 0, 0]], bool))
    got = losses.mim_mse_loss(pred, tgt, mask, cls_too=True)
    # naive: torch MSELoss mean over selected patches + cls mse
    p, t = np.asarray(pred), np.asarray(tgt)
    sel = np.asarray(mask)
    naive = np.mean((p[:, 1:][sel] - t[:, 1:][sel]) ** 2) + \
        np.mean((p[:, 0] - t[:, 0]) ** 2)
    np.testing.assert_allclose(float(got), naive, rtol=1e-5)


def test_bbox_loss_perfect_boxes():
    boxes = jnp.asarray([[0.5, 0.5, 0.2, 0.2], [0.3, 0.4, 0.1, 0.3]])
    l1, giou = losses.bbox_loss(boxes, boxes)
    np.testing.assert_allclose(float(l1), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(giou), 0.0, atol=1e-6)


def test_bbox_loss_is_image_weighting():
    pred = jnp.asarray([[0.5, 0.5, 0.2, 0.2], [0.3, 0.4, 0.1, 0.3]])
    tgt = jnp.asarray([[0.6, 0.5, 0.2, 0.2], [0.3, 0.4, 0.1, 0.3]])
    is_image = jnp.asarray([1.0, 0.0])  # first sample excluded
    l1, giou = losses.bbox_loss(pred, tgt, is_image)
    np.testing.assert_allclose(float(l1), 0.0, atol=1e-7)


def test_cross_entropy_ignore_index():
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 3, 5).astype(np.float32))
    labels = jnp.asarray([[1, -100, 2], [-100, -100, 0]])
    got = cross_entropy(logits, labels)
    lp = jax.nn.log_softmax(logits, -1)
    naive = -(lp[0, 0, 1] + lp[0, 2, 2] + lp[1, 2, 0]) / 3
    np.testing.assert_allclose(float(got), float(naive), rtol=1e-6)


def test_per_sample_lm_loss_sums():
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 3, 5).astype(np.float32))
    labels = jnp.asarray([[1, 2, -100], [0, -100, -100]])
    got = per_sample_lm_loss(logits, labels)
    assert got.shape == (2,)
    lp = jax.nn.log_softmax(logits, -1)
    np.testing.assert_allclose(float(got[0]),
                               float(-(lp[0, 0, 1] + lp[0, 1, 2])), rtol=1e-6)


def test_glue_metrics_known_values():
    from xfm_tpu.eval import glue_metrics as g

    preds = [1, 0, 1, 1]
    labels = [1, 0, 0, 1]
    assert g.accuracy(preds, labels) == 0.75
    # f1: tp=2, fp=1, fn=0 → p=2/3, r=1 → f1=0.8
    np.testing.assert_allclose(g.f1(preds, labels), 0.8)
    # perfect correlation
    np.testing.assert_allclose(g.pearson([1, 2, 3], [2, 4, 6]), 1.0)
    np.testing.assert_allclose(g.spearman([1, 2, 3], [10, 20, 30]), 1.0)
    # mcc of perfect prediction = 1
    np.testing.assert_allclose(
        g.matthews_corrcoef([1, 0, 1, 0], [1, 0, 1, 0]), 1.0)


def test_vqa_answer_processing():
    from xfm_tpu.eval.vqa_eval import process_answer, vqa_accuracy

    assert process_answer("A Dog!") == "dog"
    assert process_answer("twenty one") == "twenty 1"
    assert process_answer("dont know") == "don't know"
    anns = {1: ["dog"] * 10, 2: ["cat"] * 5 + ["dog"] * 5}
    preds = [{"question_id": 1, "answer": "the dog"},
             {"question_id": 2, "answer": "cat"}]
    acc = vqa_accuracy(preds, anns)
    assert 0.5 < acc <= 1.0


def test_cider_rewards_exact_match():
    from xfm_tpu.eval.cider import CiderD

    refs = {"a": ["the cat sat on the mat"], "b": ["a dog runs fast"]}
    c = CiderD(refs)
    _, per = c.score({"a": "the cat sat on the mat", "b": "purple monkey"})
    assert per["a"] > 5.0  # exact match scores high (scale 10)
    assert per["b"] < 1.0


def test_bleu_exact_match():
    from xfm_tpu.eval.caption_metrics import bleu

    out = bleu({"1": "the cat sat"}, {"1": ["the cat sat"]})
    np.testing.assert_allclose(out["Bleu_1"], 1.0)
    np.testing.assert_allclose(out["Bleu_3"], 1.0)


def test_rouge_l():
    """ROUGE-L F(beta=1.2) (reference refTools/evaluation/rouge/rouge.py):
    exact match = 1.0; hand-computed partial case; empty hypo = 0."""
    from xfm_tpu.eval.caption_metrics import rouge_l

    assert rouge_l({"1": "the cat sat"}, {"1": ["the cat sat"]}) == 1.0
    # hypo "a b c", ref "a c d": lcs=2, p=2/3, r=2/3 → F = 2/3
    np.testing.assert_allclose(
        rouge_l({"1": "a b c"}, {"1": ["a c d"]}), 2 / 3, rtol=1e-6)
    # max over references
    np.testing.assert_allclose(
        rouge_l({"1": "a b c"}, {"1": ["x y z", "a b c"]}), 1.0)
    assert rouge_l({"1": ""}, {"1": ["a"]}) == 0.0
    # beta weighting: p=1, r=1/2 → (1+b2)*p*r/(r+b2*p)
    b2 = 1.2 ** 2
    np.testing.assert_allclose(
        rouge_l({"1": "a b"}, {"1": ["a b c d"]}),
        (1 + b2) * 1.0 * 0.5 / (0.5 + b2), rtol=1e-6)
