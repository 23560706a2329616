"""Worker for the real 2-process integration test (test_multiprocess.py).

Launched as `python tests/_mp_worker.py` with XFM_MP_{RANK,NPROC,PORT,OUT}
env vars; joins an actual `jax.distributed` process group on the CPU
backend and exercises every multi-host path that was previously tested only
with simulated process_index args (VERDICT r2 #5):

  1. rendezvous: process_count/global devices reflect the real group
     (the path `core.mesh.maybe_init_distributed` wraps);
  2. MetricLogger.synchronize_between_processes (process_allgather psum;
     reference utils/__init__.py:118-129);
  3. collect_results per-rank shard merge with the cross-process barrier
     (reference dataset/utils.py:116-152);
  4. ShardedLineReader rank split: disjoint + complete across ranks
     (reference dist_dataset.py:89-95);
  5. merge_rerank_scores exact un-shift merge of -100-filled row slices
     (reference Retrieval.py:175-178 all_reduce).

Each check writes its evidence under XFM_MP_OUT; the parent asserts. Any
exception exits non-zero with a traceback.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1")


def main():
    rank = int(os.environ["XFM_MP_RANK"])
    nproc = int(os.environ["XFM_MP_NPROC"])
    port = int(os.environ["XFM_MP_PORT"])
    out = os.environ["XFM_MP_OUT"]

    import jax

    # this jax build's TPU plugin ignores the JAX_PLATFORMS env var; the
    # config route works (must run before backend init — tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=rank)
    import numpy as np

    # 1. real process group
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == rank
    assert len(jax.devices()) == nproc  # one CPU device per process

    # 2. metric sync: rank r contributes value (r+1) with n=r+1
    from xfm_tpu.train.metrics import MetricLogger

    logger = MetricLogger()
    logger.update(loss=float(rank + 1))
    for _ in range(rank):  # rank 1 updates twice in total
        logger.update(loss=float(rank + 1))
    logger.synchronize_between_processes()
    m = logger.meters["loss"]
    # counts: 1 + 2 = 3; total: 1*1 + 2*2 = 5
    assert m.count == sum(r + 1 for r in range(nproc)), m.count
    expected_total = sum((r + 1) * (r + 1) for r in range(nproc))
    assert abs(m.total - expected_total) < 1e-9, m.total

    # 3. collect_results (includes a sync_global_devices barrier)
    from xfm_tpu.tasks.vqa import collect_results

    final = collect_results([{"rank": rank, "item": i} for i in range(3)],
                            out, "mp_results")
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("after_collect")
    with open(final) as f:
        merged = json.load(f)
    assert len(merged) == 3 * nproc, merged
    assert sorted({r["rank"] for r in merged}) == list(range(nproc))

    # 4. ShardedLineReader rank split: disjoint + complete
    from xfm_tpu.data.jsonl import ShardedLineReader

    shard_dir = os.path.join(out, "shards")
    if rank == 0:
        os.makedirs(shard_dir, exist_ok=True)
        for s in range(4):
            with open(os.path.join(shard_dir, f"part{s}.jsonl"), "w") as f:
                for i in range(5):
                    f.write(json.dumps({"id": s * 5 + i}) + "\n")
    multihost_utils.sync_global_devices("shards_written")
    reader = ShardedLineReader(os.path.join(shard_dir, "part*.jsonl"),
                               rank=rank, world_size=nproc, shuffle=False,
                               repeat=False)
    mine = sorted(item["id"] for item in reader.iter_json())
    with open(os.path.join(out, f"reader_rank{rank}.json"), "w") as f:
        json.dump(mine, f)

    # 5. merge_rerank_scores: strided -100-filled slices -> exact full matrix
    from xfm_tpu.tasks.retrieval import merge_rerank_scores

    rng = np.random.default_rng(0)  # same full matrices on every rank
    full_i2t = rng.standard_normal((6, 9)).astype(np.float32) * 50
    full_t2i = rng.standard_normal((9, 6)).astype(np.float32) * 50
    full_i2t[0, 0] = -123.0  # genuine logit below the -100 fill: the
    full_t2i[1, 2] = -250.0  # un-shift merge must keep it exact
    mine_i2t = np.full_like(full_i2t, -100.0)
    mine_t2i = np.full_like(full_t2i, -100.0)
    mine_i2t[rank::nproc] = full_i2t[rank::nproc]
    mine_t2i[rank::nproc] = full_t2i[rank::nproc]
    got_i2t, got_t2i = merge_rerank_scores(mine_i2t, mine_t2i)
    np.testing.assert_array_equal(got_i2t, full_i2t)
    np.testing.assert_array_equal(got_t2i, full_t2i)

    # 6. a real cross-process reduction over a dp-sharded global array (the
    # collective substrate every sharded train step relies on)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), np.asarray([float(rank + 1)]))
    val = float(jax.jit(jnp.sum)(arr))
    assert abs(val - sum(r + 1 for r in range(nproc))) < 1e-6, val

    with open(os.path.join(out, f"ok_rank{rank}"), "w") as f:
        f.write("ok")
    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
