"""Worker for the true multi-process distributed test.

Launched N times by tests/test_multiprocess.py with a localhost
coordinator — the JAX analogue of the reference's spawn-on-localhost
distributed tests (ref fairseq/tests/distributed/utils.py:12-40): real
process boundaries, jax.distributed DCN bootstrap through
``parallel.mesh.initialize_multihost``, a cross-process mesh train step,
and the multihost eval gathers (``metrics/gather.py``).

Usage: multiproc_worker.py <coordinator> <num_procs> <proc_id> <outdir>
"""

import json
import os
import sys

import numpy as np


def main():
    coord, nproc, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    import jax

    # the axon sitecustomize forces jax_platforms=axon via jax.config;
    # this worker must run on local CPU (one device per process)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from one_peace_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc, jax.devices()
    assert len(jax.local_devices()) == 1

    from helpers import tiny_model_config
    from one_peace_tpu.core.config import FrameworkConfig
    from one_peace_tpu.criterions import build_criterion
    from one_peace_tpu.metrics.gather import allsum, gather_ragged
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.trainer import Trainer

    cfg = FrameworkConfig()
    cfg.model = tiny_model_config(head_type="vl")
    cfg.criterion._name = "image_text_retrieval_criterion"
    cfg.optimization.lr = 1e-4
    cfg.optimization.max_update = 100
    cfg.common.bf16 = False
    cfg.distributed.dp = nproc  # one data shard per process

    model = OnePeaceRetrievalModel(cfg.model)
    trainer = Trainer(cfg, model, build_criterion(cfg.criterion))
    assert trainer.mesh.devices.size == nproc

    # every process feeds the identical global batch; the trainer shards
    # it over the cross-process dp axis
    rs = np.random.RandomState(0)
    batch = {
        "src_tokens": rs.randint(5, 90, (2 * nproc, 7)),
        "src_images": rs.randn(2 * nproc, 3, 32, 32).astype(np.float32),
    }
    metrics = trainer.train_step(batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)

    # ragged eval gather: per-process arrays of different lengths,
    # concatenated in process order on every process
    local = np.full((3 + pid, 2), float(pid), np.float32)
    gathered = gather_ragged(local)
    expect = np.concatenate(
        [np.full((3 + i, 2), float(i), np.float32) for i in range(nproc)])
    np.testing.assert_array_equal(gathered, expect)

    total = allsum(np.float32(pid + 1))
    assert float(total) == nproc * (nproc + 1) / 2, total

    with open(os.path.join(outdir, f"rank{pid}.json"), "w") as f:
        json.dump({"loss": loss, "gnorm": float(metrics["gnorm"])}, f)
    print(f"worker {pid}/{nproc} ok loss={loss:.6f}")


if __name__ == "__main__":
    main()
