#!/usr/bin/env python3
"""xfm_tpu launcher — keeps the reference CLI surface
(reference run.py:342-391): `python3 run.py --task T --config C --output_dir O
[--checkpoint ...] [--evaluate] [--bs N] [--seed N] [--epoch N]`.

The reference builds torch.distributed.launch command strings per node
(reference run.py:44-75) and os.system's the task script; on TPU a single
process per host drives all local chips, and multi-host just needs
`jax.distributed.initialize` (handled in xfm_tpu.core.mesh) — so the task
dispatch (reference run.py:289-339) becomes a plain function call.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Honor JAX_PLATFORMS=cpu on builds whose TPU plugin ignores the env var.
if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

TASKS = {}


def task(name):
    def deco(fn):
        TASKS[name] = fn
        return fn

    return deco


@task("glue")
def run_glue(args):
    from xfm_tpu.tasks import glue

    return glue.main(args)


@task("pretrain_DIY")
def run_pretrain(args):
    from xfm_tpu.tasks import pretrain

    return pretrain.main(args)


@task("itr_coco")
@task("itr_flickr")
def run_itr(args):
    from xfm_tpu.tasks import retrieval

    return retrieval.main(args)


@task("nlvr")
def run_nlvr(args):
    from xfm_tpu.tasks import nlvr

    return nlvr.main(args)


@task("vqa")
def run_vqa(args):
    from xfm_tpu.tasks import vqa

    return vqa.main(args)


@task("imagenet")
def run_imagenet(args):
    from xfm_tpu.tasks import imagenet

    return imagenet.main(args)


@task("classify")
def run_classify(args):
    from xfm_tpu.tasks import classify

    return classify.main(args)


@task("refcoco_bbox")
def run_refcoco(args):
    """Two-stage: domain-pretrain then fine-tune (reference run.py:311-318)."""
    from xfm_tpu.tasks import grounding

    return grounding.main_bbox_pipeline(args)


@task("coco_captioning")
def run_captioning(args):
    """Two-stage: caption-pretrain then fine-tune (reference run.py:326-333)."""
    from xfm_tpu.tasks import captioning

    return captioning.main_pipeline(args)


@task("infer_caption")
def run_infer_caption(args):
    from xfm_tpu.tasks import captioning

    return captioning.main_infer(args)


# Per-task default configs used when --config is missing/nonexistent
# (reference run.py:118,139,151,163,173,185,201,224,254,267,281,291 —
# `if not os.path.exists(args.config): args.config = f'configs/{model}/...'`).
# pretrain_DIY's default ignores --model, as in reference run.py:289-291.
DEFAULT_CONFIGS = {
    "pretrain_DIY": "configs/xfm-pt/Pretrain_XBrain_base_4m.yaml",
    "glue": "configs/{model}/glue_mrpc.yaml",
    "imagenet": "configs/{model}/imagenet1k.yaml",
    "nlvr": "configs/{model}/NLVR.yaml",
    "itr_flickr": "configs/{model}/Retrieval_flickr.yaml",
    "itr_coco": "configs/{model}/Retrieval_coco.yaml",
    "vqa": "configs/{model}/VQA.yaml",
    "refcoco_bbox": "configs/{model}/Grounding_bbox.yaml",
    "coco_captioning": "configs/{model}/Captioning.yaml",
    "infer_caption": "configs/{model}/Captioning.yaml",
}


def resolve_config(args):
    """Reference CLI semantics: --config may be omitted or point at a
    missing file; the task's default under configs/{--model}/ is used."""
    if args.config and os.path.exists(args.config):
        return args.config
    tmpl = DEFAULT_CONFIGS.get(args.task)
    if tmpl is None:
        raise SystemExit(f"--config is required for task {args.task!r} "
                         "(no default config exists)")
    root = os.path.dirname(os.path.abspath(__file__))
    cand = os.path.join(root, tmpl.format(model=args.model))
    if not os.path.exists(cand):
        raise SystemExit(f"config {args.config!r} not found and the default "
                         f"{cand!r} does not exist")
    if args.config:
        print(f"### config {args.config!r} not found, using default {cand}",
              flush=True)
    return cand


def build_parser():
    p = argparse.ArgumentParser(description="xfm_tpu task launcher")
    p.add_argument("--task", required=True, choices=sorted(TASKS.keys()))
    p.add_argument("--config", default="",
                   help="task YAML; if missing, the task default under "
                        "configs/{--model}/ is used")
    p.add_argument("--model", default="xfm-ft",
                   help="default fine-tuning config family "
                        "(reference run.py:348)")
    p.add_argument("--output_dir", default="output")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--load_ckpt_from", default=None)
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--bs", type=int, default=None,
                   help="global batch size (divided by device count)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--dist", default=None,
                   help="accepted for CLI compat; mesh comes from config")
    p.add_argument("--master_port", type=int, default=12345,
                   help="accepted for CLI compat (reference run.py:365); "
                        "TPU runtime needs no rendezvous port")
    p.add_argument("--output_hdfs", default=None)
    return p


def main():
    args = build_parser().parse_args()
    args.config = resolve_config(args)
    from xfm_tpu.core.mesh import maybe_init_distributed

    maybe_init_distributed()
    os.makedirs(args.output_dir, exist_ok=True)
    result = TASKS[args.task](args)
    if args.output_hdfs:
        from xfm_tpu.data import io as xio

        xio.makedirs(args.output_hdfs)
        for f in ("log.txt", "config.yaml"):
            src = os.path.join(args.output_dir, f)
            if os.path.exists(src):
                xio.copy(src, os.path.join(args.output_hdfs, f))
    return result


if __name__ == "__main__":
    main()
