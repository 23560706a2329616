"""PTB caption tokenizer (reference
refTools/evaluation/tokenizer/ptbtokenizer.py: Stanford jar with
-preserveLines -lowerCase then PUNCTUATIONS removal)."""
from xfm_tpu.eval.ptb_tokenizer import (ptb_tokenize, ptb_word_tokenize,
                                        tokenize_sentence)


def test_lowercase_and_final_period():
    assert tokenize_sentence("A man riding a Horse.") == \
        ["a", "man", "riding", "a", "horse"]


def test_contractions_kept_as_ptb_tokens():
    # the jar splits clitics but keeps the apostrophe; none of 's/n't/'re
    # are in the PUNCTUATIONS removal list
    assert tokenize_sentence("It's a dog, isn't it?") == \
        ["it", "'s", "a", "dog", "is", "n't", "it"]
    assert tokenize_sentence("we're close") == ["we", "'re", "close"]


def test_punctuation_tokens_removed():
    assert tokenize_sentence('He said "hello world" -- really...') == \
        ["he", "said", "hello", "world", "really"]
    # but punctuation inside words survives
    assert tokenize_sentence("a well-known 4,000-mile trail") == \
        ["a", "well-known", "4,000-mile", "trail"]


def test_brackets_become_tags_then_dropped():
    assert tokenize_sentence("a dog (small) [brown]") == \
        ["a", "dog", "small", "brown"]
    assert "-lrb-" in ptb_word_tokenize("a (b)")


def test_dict_contract_matches_reference_shape():
    out = ptb_tokenize({"img1": ["A cat sat.", "The cat, sitting."],
                        "img2": ["Dogs run!"]})
    assert out == {"img1": ["a cat sat", "the cat sitting"],
                   "img2": ["dogs run"]}


def test_coco_caption_eval_is_case_and_punct_insensitive():
    from xfm_tpu.eval.caption_metrics import coco_caption_eval
    hyp = {"1": "A man rides a horse.", "2": "Two dogs play!"}
    refs = {"1": ["a man rides a horse"], "2": ["two dogs play"]}
    out = coco_caption_eval(hyp, refs)
    assert out["Bleu_4"] == 1.0
    assert out["ROUGE_L"] == 1.0
    # raw comparison (tokenize=False) would miss on the trailing period
    raw = coco_caption_eval(hyp, refs, tokenize=False)
    assert raw["Bleu_4"] < 1.0


def test_spice_hook_both_branches(monkeypatch):
    """Pin the optional-pycocoevalcap SPICE wiring (VERDICT r3 #7): a stubbed
    `pycocoevalcap.spice.spice.Spice` lands its score in the eval dict with
    the reference's gts/res calling convention; without the package the dict
    carries an explicit SPICE: None + note."""
    import sys
    import types

    from xfm_tpu.eval.caption_metrics import spice

    hypos = {"1": "a dog runs", "2": "a cat sits"}
    refs = {"1": ["a dog is running", "the dog runs"], "2": ["a cat sits"]}

    seen = {}

    class FakeSpice:
        def compute_score(self, gts, res):
            seen["gts"] = gts
            seen["res"] = res
            return 0.421, [{"All": {"f": 0.421}}] * len(res)

    pkg = types.ModuleType("pycocoevalcap")
    sub = types.ModuleType("pycocoevalcap.spice")
    mod = types.ModuleType("pycocoevalcap.spice.spice")
    mod.Spice = FakeSpice
    pkg.spice = sub
    sub.spice = mod
    monkeypatch.setitem(sys.modules, "pycocoevalcap", pkg)
    monkeypatch.setitem(sys.modules, "pycocoevalcap.spice", sub)
    monkeypatch.setitem(sys.modules, "pycocoevalcap.spice.spice", mod)

    out = spice(hypos, refs)
    assert out == {"SPICE": 0.421}
    # reference calling convention (dataset/utils.py:368-391): gts holds the
    # reference lists, res wraps each hypothesis in a 1-element list
    assert seen["gts"] == refs
    assert seen["res"] == {"1": ["a dog runs"], "2": ["a cat sits"]}

    # present branch flows through coco_caption_eval too
    from xfm_tpu.eval.caption_metrics import coco_caption_eval
    full = coco_caption_eval(hypos, refs, tokenize=False)
    assert full["SPICE"] == 0.421 and "SPICE_note" not in full

    # absent branch: import fails -> explicit None + note
    for name in ("pycocoevalcap", "pycocoevalcap.spice",
                 "pycocoevalcap.spice.spice"):
        monkeypatch.setitem(sys.modules, name, None)
    out = spice(hypos, refs)
    assert out["SPICE"] is None and "pycocoevalcap" in out["SPICE_note"]
