"""Training CLI — parity with the reference ``run.py`` flags (``run.py:73-95``).

Differences from the reference are TPU-native by design:
  * ``-n`` counts chips used for data parallelism; ``--tp`` adds tensor
    parallelism within the same mesh (replaces DataParallel/DDP + NCCL).
  * checkpoints are orbax directories managed by ``train.checkpoint``.
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil

import jax
import numpy as np

from ..config import load_config
from ..data.loader import FeatureLoader
from ..models.registry import LM_TYPES, build_model
from ..parallel.mesh import make_mesh, param_shardings
from ..train.checkpoint import Checkpointer
from ..train.trainer import (
    Trainer,
    TrainState,
    default_speech_batch,
    lm_batch,
    resident_speech_batch,
    wave_speech_batch,
)

logger = logging.getLogger(__name__)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train a speech/LM model on TPU")
    p.add_argument("-c", "--config", type=str, required=True)
    p.add_argument("-n", "--ngpu", type=int, default=0,
                   help="number of chips for data parallelism (0 = all)")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel degree")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-stage degree: stacked encoder layers "
                        "(scan_layers: true) shard params+opt state over a "
                        "'pipe' mesh axis (parallel/mesh.py)")
    p.add_argument("--pp-schedule", type=str, default=None,
                   choices=("sharded", "1f1b"),
                   help="pipeline schedule for --pp: 'sharded' (GSPMD "
                        "weight-streaming stage sharding, composes with tp) "
                        "or '1f1b' (interleaved compute pipeline with "
                        "rematerialized backward, constant activation "
                        "memory in microbatch count)")
    p.add_argument("--pp-micro-batches", type=int, default=None,
                   help="microbatches per step for --pp-schedule 1f1b "
                        "(default: pp degree; more = smaller bubble)")
    p.add_argument("--steps-per-exec", type=int, default=None,
                   help="scan N optimizer updates inside one jitted program "
                        "(amortizes host dispatch; same-shape batches only)")
    p.add_argument("--ep", type=int, default=1,
                   help="expert-parallel degree: MoE expert-stacked params "
                        "shard over an 'expert' mesh axis (requires "
                        "encoder.moe_experts divisible by this)")
    p.add_argument("-s", "-se", "--seed", type=int, default=1234)
    p.add_argument("-l", "--logging_level", type=str, default="INFO")
    p.add_argument("-lg", "--log_file", type=str, default=None,
                   help="also write logs to this file (reference run.py:82)")
    p.add_argument("-mp", "--mixed_precision", action="store_true",
                   help="bfloat16 compute (the working version of the "
                        "reference's vestigial apex flags)")
    p.add_argument("-im", "--init_model", type=str, default=None,
                   help="warm-start weights from a checkpoint dir, expdir, or "
                        "reference .pt (fine-tuning; reference run.py:86)")
    p.add_argument("-ios", "--init_optim_state", type=str, default=None,
                   help="restore optimizer state from a model.epoch.N dir "
                        "(reference run.py:87)")
    p.add_argument("-tfe", "--from_epoch", type=int, default=0,
                   help="start epoch counter here (reference run.py:91)")
    p.add_argument("-tfs", "--from_step", type=int, default=0,
                   help="start scheduler global step here (reference run.py:90)")
    p.add_argument("-r", "--local_rank", type=int, default=0,
                   help="accepted for reference-CLI parity; ignored")
    p.add_argument("-vb", "--verbose", type=int, default=0,
                   help="accepted for reference-CLI parity; ignored")
    p.add_argument("-ol", "--opt_level", type=str, default="O1",
                   help="accepted for reference-CLI parity; ignored (use -mp)")
    p.add_argument("-p", "--parallel_mode", type=str, default="dp",
                   help="accepted for reference-CLI parity; parallelism is the "
                        "mesh (-n data x --tp model), not dp/ddp processes")
    p.add_argument("-g", "--gpus", type=str, default=None,
                   help="accepted for reference-CLI parity; ignored (mesh uses -n)")
    p.add_argument("-ct", "--continue_training", action="store_true")
    p.add_argument("-kl", "-knpt", "--keep_last_n_checkpoints", type=int, default=30)
    p.add_argument("-ms", "--mixspeech", action="store_true")
    p.add_argument("-debug", "--debug", action="store_true")
    p.add_argument("--expdir", type=str, default=None)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--visual", action="store_true",
                   help="write TensorBoard scalars to <expdir>/tb (the "
                        "reference's is_visual had no CLI flag, SURVEY §2.4)")
    p.add_argument("--profile", type=str, default=None,
                   help="write a jax.profiler trace to this directory")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() and shard batches by host")
    p.add_argument("--supervise", type=int, default=0, metavar="N",
                   help="failure recovery: run training as a child process "
                        "and auto-restart up to N times on crash, resuming "
                        "(-ct) from the newest checkpoint (the reference has "
                        "only manual crash-resume, SURVEY §5)")
    p.add_argument("--async-save", action="store_true",
                   help="overlap checkpoint device-fetch + write with training "
                        "(also config key train.async_save)")
    return p


def _supervise(args, argv) -> int:
    """Failure-recovery supervisor: run training in a child process; on a
    non-zero exit, restart it with ``-ct`` (resume from the newest epoch
    checkpoint — or fresh if none was written yet), up to ``--supervise N``
    times. Process isolation is deliberate: a wedged accelerator client
    cannot be recovered in-process."""
    import subprocess
    import sys
    import time

    src = list(argv) if argv is not None else sys.argv[1:]
    child = []
    skip = False
    for a in src:
        if skip:
            skip = False
            continue
        if a == "--supervise":
            skip = True
            continue
        if a.startswith("--supervise="):
            continue
        child.append(a)
    has_ct = bool({"-ct", "--continue_training"} & set(child))

    attempt = 0
    while True:
        cmd = [sys.executable, "-m", "opentransformer_tpu.cli.run", *child]
        if attempt > 0 and not has_ct:
            cmd.append("-ct")
        t0 = time.time()
        rc = subprocess.call(cmd)
        if rc == 0:
            if attempt:
                logger.info("supervised training completed after %d restart(s)", attempt)
            return 0
        attempt += 1
        if attempt > args.supervise:
            logger.error("training failed (rc=%s); restart budget %d exhausted",
                         rc, args.supervise)
            return rc
        logger.warning("training crashed (rc=%s) after %.0fs; restart %d/%d "
                       "will resume from the newest checkpoint",
                       rc, time.time() - t0, attempt, args.supervise)


def make_dev_cer_probe(cfg, model, dev_loader, max_batches: int = 4):
    """Per-epoch greedy-decode CER over a fixed dev subset.

    Wires the quality probe the reference's (unreachable) dev loop never had
    (``otrans/train/trainer.py:112-121``): one beam-1 recognizer whose jitted
    search takes params as an ARGUMENT, so every epoch reuses the same
    compiled program — only epoch 0 pays the compile. Catches a collapsed
    run (degenerate short outputs, CER ~100%) at epoch 1 instead of after
    hours of training + averaging + decode.
    """
    import jax.numpy as jnp

    from ..data import load_idx2unit_map
    from ..ops.levenshtein import ErrorRateAccumulator
    from ..recognize.base import SpeechToTextRecognizer

    idx2unit = load_idx2unit_map(cfg["data"]["vocab"])
    recognizer = SpeechToTextRecognizer(
        model, params=None, beam_width=1,
        max_len=int(cfg["train"].get("dev_cer_max_len", 32)),
        idx2unit=idx2unit,
    )
    batches = []
    for i, (utt_ids, inputs, _targets) in enumerate(dev_loader):
        if i >= max_batches:
            break
        batches.append((utt_ids, jnp.asarray(inputs["inputs"]),
                        jnp.asarray(inputs["mask"])))
    targets_dict = getattr(dev_loader.dataset, "targets_dict", {})

    def probe(params, epoch):
        recognizer.params = params
        cer = ErrorRateAccumulator()
        n_utts = 0
        for utt_ids, feats, mask in batches:
            texts, _scores = recognizer.recognize(feats, mask)
            for i, utt in enumerate(utt_ids):
                ref = " ".join(idx2unit.get(t, "<UNK>")
                               for t in targets_dict.get(utt, []))
                cer.update(ref.split(), texts[i][0].split())
                n_utts += 1
        logger.info("epoch %d dev greedy CER %.2f%% (%d/%d tokens, %d utts)",
                    epoch, cer.rate * 100, cer.errors, cer.tokens, n_utts)
        return cer.rate

    return probe


def main(argv=None) -> int:
    # test/CI escape hatch: this image's sitecustomize pins the TPU backend
    # and ignores JAX_PLATFORMS; supervised child processes (and CI) force a
    # platform through the config instead
    if os.environ.get("OT_FORCE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["OT_FORCE_PLATFORM"])
    from . import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    args = build_argparser().parse_args(argv)
    logging.basicConfig(
        level=getattr(logging, args.logging_level.upper(), logging.INFO),
        format="%(asctime)s - %(levelname)s - %(message)s",
        force=True,
    )
    if args.log_file:
        fh = logging.FileHandler(args.log_file)
        fh.setFormatter(logging.Formatter("%(asctime)s - %(levelname)s - %(message)s"))
        logging.getLogger().addHandler(fh)
    if args.supervise:
        # must run BEFORE any jax/TPU initialization: the child owns the chip
        return _supervise(args, argv)
    cfg = load_config(args.config)
    expdir = args.expdir or os.path.join("egs_exp", cfg["train"].get("save_name", "exp"))
    os.makedirs(expdir, exist_ok=True)
    shutil.copy(args.config, os.path.join(expdir, os.path.basename(args.config)))

    np.random.seed(args.seed)
    rng = jax.random.PRNGKey(args.seed)

    if args.multihost:
        jax.distributed.initialize()
        logger.info("multihost: process %d/%d", jax.process_index(), jax.process_count())

    n_dev = len(jax.devices())
    n_data = args.ngpu or max(n_dev // (args.tp * args.pp * args.ep), 1)
    mesh = (make_mesh(n_data=n_data, n_model=args.tp, n_pipe=args.pp,
                      n_expert=args.ep)
            if n_data * args.tp * args.pp * args.ep > 1 else None)
    if args.ep > 1:
        n_experts = int(cfg["model"].get("encoder", {}).get("moe_experts", 0))
        if n_experts % args.ep != 0:
            raise SystemExit(f"--ep {args.ep} requires encoder.moe_experts "
                             f"divisible by it (got {n_experts})")
    if args.pp > 1:
        enc = cfg["model"].get("encoder", {})
        if (cfg["model"].get("encoder_type", "transformer") != "transformer"
                or not enc.get("scan_layers", False)):
            raise SystemExit("--pp requires a transformer encoder with "
                             "scan_layers: true (stacked layer params)")
        if int(enc.get("n_blocks", 12)) % args.pp != 0:
            raise SystemExit(f"--pp {args.pp} must divide encoder.n_blocks="
                             f"{enc.get('n_blocks', 12)} (else stages would "
                             "silently replicate)")
    logger.info("devices=%d mesh=%s", n_dev, dict(mesh.shape) if mesh else None)

    model_cfg = cfg["model"]
    import jax.numpy as jnp

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        "bfloat16" if args.mixed_precision else str(cfg["train"].get("dtype", "float32"))
    ]
    model = build_model(model_cfg, dtype=dtype)
    is_lm = model_cfg["type"] in LM_TYPES
    batch_fn = lm_batch if is_lm else default_speech_batch
    preprocess_fn = None
    if not is_lm and cfg["data"].get("extract_on_device", False):
        from ..data.device_pipeline import make_device_frontend

        device_frontend = make_device_frontend(cfg["data"])
        batch_fn = wave_speech_batch

        def preprocess_fn(waveforms, wave_lengths, targets, targets_length, *, rng, train):
            feats, mask = device_frontend(waveforms, wave_lengths, rng, train=train)
            return feats, mask, targets, targets_length

        logger.info("on-device feature extraction enabled (pallas fbank)")

    shard_kw = {}
    if args.multihost:
        shard_kw = {"num_shards": jax.process_count(), "shard_id": jax.process_index()}
    loader = FeatureLoader(cfg, "train", seed=args.seed, **shard_kw)
    logger.info("train loader: %d batches", len(loader))
    eval_kw = {}
    if preprocess_fn is not None:
        # extract_on_device: the dev loader stays on the host feature path
        eval_kw = {"eval_batch_fn": default_speech_batch, "eval_preprocess_fn": None}
    device_resident = getattr(loader, "device_resident", False)
    if device_resident:
        # corpus features live in HBM; the train step gathers rows by index
        # and applies noise + SpecAugment on device (data/resident.py)
        from ..data.resident import make_resident_preprocess

        corpus, corpus_lens = loader.build_resident_corpus()
        preprocess_fn, resident_state = make_resident_preprocess(
            cfg["data"], corpus, corpus_lens, mesh=mesh)
        del corpus  # host copy freed; the device copy is the working one
        batch_fn = resident_speech_batch
        eval_kw = {"eval_batch_fn": default_speech_batch,
                   "eval_preprocess_fn": None,
                   # threaded as a jit argument — NOT closure-captured — so
                   # the corpus never lands in the compile payload
                   "preprocess_state": resident_state}
    dev_loader = None
    if "dev" in cfg["data"]:
        dev_loader = FeatureLoader(cfg, "dev", is_eval=True, seed=args.seed, **shard_kw)
        logger.info("dev loader: %d batches", len(dev_loader))
    dev_probe_fn = None
    if (dev_loader is not None and not is_lm
            and (preprocess_fn is None or device_resident)
            and model_cfg["type"] == "speech2text"
            and bool(cfg["train"].get("dev_cer_probe", False))
            and jax.process_count() == 1):
        dev_probe_fn = make_dev_cer_probe(
            cfg, model, dev_loader,
            max_batches=int(cfg["train"].get("dev_cer_batches", 4)))
        logger.info("per-epoch dev greedy-CER probe enabled")

    ck = Checkpointer(expdir, config=cfg.raw,
                      async_save=args.async_save or bool(cfg["train"].get("async_save", False)))
    train_cfg = cfg["train"]
    if args.steps_per_exec:
        # merged into the config BEFORE construction so the Trainer's
        # steps_per_exec guards (accum_steps == 1, no 1f1b) apply
        train_cfg = {**dict(train_cfg), "steps_per_exec": int(args.steps_per_exec)}
    trainer = Trainer(
        train_cfg, model, mesh=mesh, expdir=expdir, checkpointer=ck,
        is_mixspeech=args.mixspeech, is_visual=args.visual, log_interval=args.log_interval,
        keep_last_n=args.keep_last_n_checkpoints, batch_fn=batch_fn,
        is_debug=args.debug, dev_loader=dev_loader, dev_probe_fn=dev_probe_fn,
        preprocess_fn=preprocess_fn, **eval_kw,
        pp_schedule=args.pp_schedule, pp_micro_batches=args.pp_micro_batches,
    )

    first = next(iter(loader))
    state = trainer.init_state(rng, first)
    from ..utils import format_parameter_census

    logger.info("model parameters:\n%s", format_parameter_census(state.params))
    if args.continue_training:
        template = {
            "params": jax.tree_util.tree_map(np.asarray, state.params),
            "opt_state": jax.tree_util.tree_map(np.asarray, state.opt_state),
            "extra": {"global_step": 0},
        }
        latest = ck.restore_latest(item=template)
        if latest is not None:
            epoch, payload = latest
            if mesh is not None:
                place = lambda t: jax.device_put(t, param_shardings(t, mesh))
            else:
                place = lambda t: jax.tree_util.tree_map(jax.numpy.asarray, t)
            state = TrainState(
                params=place(payload["params"]),
                opt_state=jax.tree_util.tree_map(jax.numpy.asarray, payload["opt_state"]),
                nan_skips=state.nan_skips,
            )
            trainer.global_epoch = epoch + 1
            trainer.global_step = int(payload["extra"].get("global_step", 1))
            logger.info("resumed from epoch %d (global step %d)", epoch, trainer.global_step)

    if args.continue_training and (args.init_model or args.init_optim_state):
        logger.warning("-ct takes precedence: -im/-ios are ignored when resuming")
    if args.init_model and not args.continue_training:
        # warm-start weights (fine-tuning): orbax dir, expdir or reference .pt
        from .eval import load_checkpoint as load_any_checkpoint

        params_np, _ = load_any_checkpoint(args.init_model)
        if mesh is not None:
            params = jax.device_put(params_np, param_shardings(params_np, mesh))
        else:
            params = jax.tree_util.tree_map(jax.numpy.asarray, params_np)
        state = state.replace(params=params)
        logger.info("initialized model weights from %s", args.init_model)

    if args.init_optim_state and not args.continue_training:
        path = args.init_optim_state.rstrip("/")
        template = {
            "params": jax.tree_util.tree_map(np.asarray, state.params),
            "opt_state": jax.tree_util.tree_map(np.asarray, state.opt_state),
            "extra": {"global_step": 0},
        }
        payload = Checkpointer(os.path.dirname(path)).restore(
            os.path.basename(path), item=template)
        state = state.replace(
            opt_state=jax.tree_util.tree_map(jax.numpy.asarray, payload["opt_state"]))
        trainer.global_step = int(payload["extra"].get("global_step", trainer.global_step))
        logger.info("restored optimizer state from %s", path)

    if args.from_epoch:
        trainer.global_epoch = args.from_epoch
    if args.from_step:
        trainer.global_step = args.from_step

    if args.profile:
        jax.profiler.start_trace(args.profile)
    trainer.train(state, loader, rng)
    if args.profile:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", args.profile)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
