"""Worker process for tests/test_multihost.py.

Runs one jax.distributed process (CPU backend, Gloo collectives) of an
n-process training job over a global data mesh, mirroring the production
multihost contract: every process iterates the SAME batch sequence and
holds its row-slice (FeatureLoader num_shards/shard_id); the trainer
assembles global arrays from the per-process slices.

Usage: python tests/multihost_worker.py PORT PID NPROC LOCAL_DEVS OUT \
       STEPS_PER_EXEC ACCUM
With NPROC=1 it runs the single-process reference on the permuted global
batch (rows re-ordered as concat of the per-host slices, which is what the
multihost assembly produces).
"""

import os
import sys


def model_cfg():
    return {
        "type": "speech2text",
        "frontend_type": "conv",
        "frontend": {
            "input_size": 8, "output_size": 16, "in_channel": 1,
            "mid_channel": 4, "out_channel": 8,
            "kernel_size": [[3, 3], [3, 3]], "stride": [2, 2],
            "dropout": 0.0, "act_func_type": "relu",
        },
        "encoder_type": "transformer",
        "encoder": {
            "d_model": 16, "n_heads": 2, "d_ff": 32, "n_blocks": 1,
            "residual_dropout": 0.0, "normalize_before": False,
            "activation": "relu", "relative_positional": False,
        },
        "decoder_type": "transformer",
        "decoder": {
            "vocab_size": 16, "d_model": 16, "n_heads": 2, "d_ff": 32,
            "memory_dim": 16, "n_blocks": 1, "residual_dropout": 0.0,
            "activation": "relu", "share_embedding": True,
        },
        "ctc_weight": 0.0,
        "smoothing": 0.1,
    }


def global_batches(np, n_batches=6, b=8, t=17, f=8, u=5, vocab=16):
    batches = []
    rng = np.random.default_rng(0)
    for _ in range(n_batches):
        feats = rng.normal(size=(b, t, f)).astype(np.float32)
        mask = np.ones((b, t), bool)
        tgt = np.zeros((b, u + 2), np.int32)
        for i in range(b):
            tgt[i, 0] = 1
            tgt[i, 1 : u + 1] = rng.integers(3, vocab, u)
            tgt[i, u + 1] = 1
        batches.append((feats, mask, tgt, np.full((b,), u + 1, np.int32)))
    return batches


def main():
    port, pid, nproc, local_devs, out_path, spe, accum = sys.argv[1:8]
    pid, nproc = int(pid), int(nproc)
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devs}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=nproc, process_id=pid
        )
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.parallel.mesh import make_mesh
    from opentransformer_tpu.train.trainer import Trainer

    model = build_model(model_cfg())
    mesh = make_mesh(n_data=jax.device_count())
    tcfg = {
        # plain SGD: params differ from the reference run by exactly
        # lr x (cross-process reduction-order noise) ~ 1e-9, so the test
        # tolerance stays sharp (Adam would amplify float drift 1000x)
        "optimizer_type": "sgd", "optimizer": {},
        "scheduler_type": "constant", "scheduler": {"lr": 0.05},
        "epochs": 1, "clip_grad": 5.0,
        "steps_per_exec": int(spe), "accum_steps": int(accum),
    }
    trainer = Trainer(tcfg, model, mesh=mesh, log_interval=10 ** 9)

    raw = global_batches(np)
    batches = []
    for feats, mask, tgt, tlen in raw:
        if nproc > 1:
            # production row-slicing (FeatureLoader shard_id::num_shards)
            sl = slice(pid, None, nproc)
            feats, mask, tgt, tlen = feats[sl], mask[sl], tgt[sl], tlen[sl]
        else:
            # reference: the permutation the multihost assembly induces
            order = np.concatenate([np.arange(p, len(feats), 2) for p in range(2)])
            feats, mask, tgt, tlen = feats[order], mask[order], tgt[order], tlen[order]
        batches.append((None, {"inputs": feats, "mask": mask},
                        {"targets": tgt, "targets_length": tlen}))

    state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
    state = trainer.train_one_epoch(0, state, batches, jax.random.PRNGKey(1))

    if jax.process_index() == 0:
        flat = {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
            # params are replicated on the data-only mesh: the first
            # addressable shard is the full array
            flat[jax.tree_util.keystr(path)] = np.asarray(leaf.addressable_data(0))
        flat["__global_step__"] = np.asarray(trainer.global_step)
        np.savez(out_path, **flat)
        print(f"proc {pid}: wrote {out_path} (global_step={trainer.global_step})",
              flush=True)


if __name__ == "__main__":
    main()
