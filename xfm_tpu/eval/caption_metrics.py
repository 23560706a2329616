"""Caption evaluation: BLEU-1..4 + CIDEr-D + METEOR (replacing pycocoevalcap
in reference dataset/utils.py:368-391 coco_caption_eval, utils/bleu.py, and
the meteor-1.5 jar in refTools/evaluation/meteor — see eval/meteor.py for
the reimplementation notes). SPICE needs a dependency parser + scene-graph
models and is intentionally not provided; BLEU+CIDEr cover the headline
numbers."""
from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List

from .cider import CiderD


def bleu(hypos: Dict[str, str], refs: Dict[str, List[str]], max_n: int = 4):
    """Corpus BLEU with standard brevity penalty."""
    clipped = [0] * max_n
    totals = [0] * max_n
    hyp_len = ref_len = 0
    for k, h in hypos.items():
        hw = h.split()
        rws = [r.split() for r in refs.get(k, [])]
        if not rws:
            continue
        hyp_len += len(hw)
        ref_len += min((abs(len(r) - len(hw)), len(r)) for r in rws)[1]
        for n in range(1, max_n + 1):
            hc = Counter(tuple(hw[i:i + n]) for i in range(len(hw) - n + 1))
            mc = Counter()
            for rw in rws:
                rc = Counter(tuple(rw[i:i + n])
                             for i in range(len(rw) - n + 1))
                for g, c in rc.items():
                    mc[g] = max(mc[g], c)
            clipped[n - 1] += sum(min(c, mc.get(g, 0))
                                  for g, c in hc.items())
            totals[n - 1] += max(sum(hc.values()), 0)
    precisions = [(clipped[i] / totals[i]) if totals[i] else 0.0
                  for i in range(max_n)]
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len /
                                                max(hyp_len, 1))
    out = {}
    for n in range(1, max_n + 1):
        ps = precisions[:n]
        if min(ps) > 0:
            out[f"Bleu_{n}"] = bp * math.exp(sum(math.log(p) for p in ps)
                                             / n)
        else:
            out[f"Bleu_{n}"] = 0.0
    return out


def coco_caption_eval(hypos: Dict[str, str],
                      refs: Dict[str, List[str]]) -> dict:
    from .meteor import meteor

    out = bleu(hypos, refs)
    cider_mean, _ = CiderD(refs).score(hypos)
    out["CIDEr"] = cider_mean
    out["METEOR"] = meteor(hypos, refs)
    return out
