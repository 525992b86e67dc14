"""Decoding CLI — parity with the reference ``eval.py`` (``eval.py:205-236``).

Loads an orbax checkpoint (config embedded in the expdir), optionally an
external LM, decodes the chosen set with batch beam search, and writes the
reference-compatible artifacts: ``predict.txt`` (1-best), ``predict.log``
(n-best with scores), ``RESULT`` (corpus CER + oracle top-n CER + RTF).
"""

from __future__ import annotations

import argparse
import logging
import os
import re
import time

import jax
import numpy as np

from ..config import Config, load_config
from ..data import load_idx2unit_map
from ..data.loader import FeatureLoader
from ..models.registry import build_model
from ..ops.levenshtein import ErrorRateAccumulator, edit_distances
from ..recognize.base import build_recognizer
from ..train.checkpoint import Checkpointer

logger = logging.getLogger(__name__)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Decode with a trained model")
    p.add_argument("-m", "--load_model", type=str, required=True,
                   help="checkpoint dir (model.epoch.N / model.average.fromXtoY) or expdir")
    p.add_argument("-c", "--config", type=str, default=None)
    p.add_argument("-b", "--batch_size", type=int, default=None)
    p.add_argument("-bw", "--beam_width", type=int, default=5)
    p.add_argument("-nb", "--nbest", type=int, default=1,
                   help="n-best size for the native CTC beam / transducer beam")
    p.add_argument("-pn", "--penalty", type=float, default=0.6)
    p.add_argument("-ld", "--lamda", type=float, default=5.0)
    p.add_argument("-ml", "--max_len", type=int, default=100)
    p.add_argument("-lm", "--load_language_model", type=str, default=None)
    p.add_argument("-lmw", "--lm_weight", type=float, default=0.1)
    p.add_argument("-ngram", "--ngram_lm", type=str, default=None,
                   help="n-gram LM for the native CTC prefix beam decoder "
                        "(ARPA text, .otbin cache, or KenLM probing binary)")
    p.add_argument("-alpha", "--alpha", type=float, default=0.1,
                   help="n-gram LM weight (CTC prefix beam)")
    p.add_argument("-beta", "--beta", type=float, default=0.0,
                   help="word-insertion bonus (CTC prefix beam)")
    p.add_argument("-prune", "--prune_k", type=int, default=32,
                   help="per-frame candidate count for the CTC prefix beam "
                        "(ctcdecode's cutoff_top_n analog; pruned on device)")
    p.add_argument("-ctcw", "-cw", "--ctc_weight", type=float, default=0.0,
                   help="joint CTC/attention n-best rescoring weight "
                        "(model must be trained with ctc_weight > 0)")
    p.add_argument("-md", "--mode", type=str, default="beam",
                   choices=["beam", "greedy"],
                   help="'greedy' forces beam_width=1")
    p.add_argument("-mt", "--max_tokens_per_chunk", type=int, default=8,
                   help="transducer: max emissions per encoder frame")
    p.add_argument("-n", "--ngpu", type=int, default=1,
                   help="data-parallel decode over N chips: batch rows shard "
                        "over a 'data' mesh axis (the reference's -n only "
                        "selected GPUs for torch DataParallel)")
    p.add_argument("-pf", "--path_fusion", action="store_true",
                   help="accepted for reference-CLI parity (transducer path "
                        "fusion was vestigial upstream); ignored")
    p.add_argument("-test", "--test", action="store_true",
                   help="accepted for reference-CLI parity; ignored")
    p.add_argument("-resc", "--apply_rescoring", action="store_true",
                   help="accepted for parity; use -ctcw for working joint "
                        "CTC/attention rescoring")
    p.add_argument("-rw", "--rescore_weight", type=float, default=1.0,
                   help="accepted for parity (see -ctcw / -lm_resc)")
    p.add_argument("-sba", "--sort_by_avg_score", action="store_true",
                   help="rank n-best by score/length instead of raw score")
    p.add_argument("-lm_resc", "--lm_rescore_weight", type=float, default=0.0,
                   help="post-beam n-best LM rescoring weight (the reference "
                        "shipped this helper unwired, recognize/base.py:52-88)")
    p.add_argument("-d", "--decode_set", type=str, default="test")
    p.add_argument("-ns", "--num_sample", type=int, default=0, help="decode only N samples")
    p.add_argument("-debug", "--debug", action="store_true")
    p.add_argument("-s", "--suffix", type=str, default=None)
    p.add_argument("-p2w", "--piece2word", action="store_true",
                   help="join sentencepiece pieces: strip spaces, '▁'→space")
    p.add_argument("--online", action="store_true",
                   help="streaming decode over a chunked-attention encoder: "
                        "frame-synchronous for ctc/transducer, incremental "
                        "beam re-decode for speech2text (recognize/online.py)")
    p.add_argument("--long_form", action="store_true",
                   help="windowed encoding for long audio (recognize/streaming.py)")
    p.add_argument("--window", type=int, default=1200, help="long-form window frames")
    p.add_argument("--context", type=int, default=200, help="long-form context frames")
    p.add_argument("--profile", type=str, default=None,
                   help="write a jax.profiler trace of the decode loop to "
                        "this directory (same as run.py --profile)")
    return p


LANG_TAGS = ("<PESN>", "<VIET>", "<SWAH>")


def postprocess(text: str, piece2word: bool = False) -> str:
    """Scoring-side text normalization (reference ``eval.py:148-167``):
    optional sentencepiece ▁-joining and language-tag stripping."""
    for tag in LANG_TAGS:
        text = text.replace(tag, " ")
    if piece2word:
        text = text.replace(" ", "").replace("▁", " ").strip()
    return " ".join(text.split())


def load_checkpoint(path: str):
    """Returns (params, config). Accepts an expdir, a checkpoint dir, or a
    reference torch ``.pt`` file (model or LM — converted on the fly)."""
    path = path.rstrip("/")
    if path.endswith(".pt"):
        if not os.path.isfile(path):
            raise SystemExit(f"error: checkpoint file not found: {path}")
        from ..compat import load_reference_any

        variables, cfg = load_reference_any(path)
        return variables, (cfg or None)
    if os.path.basename(path).startswith("model."):
        if not os.path.isdir(path):
            raise SystemExit(f"error: checkpoint directory not found: {path}")
        expdir = os.path.dirname(path)
        ck = Checkpointer(expdir)
        payload = ck.restore(os.path.basename(path))
    else:
        ck = Checkpointer(path)
        latest = ck.restore_latest()
        if latest is None:
            raise SystemExit(f"error: no model.epoch.N checkpoints under {path}")
        payload = latest[1]
    return payload["params"], ck.load_config()


def load_model_and_lm(load_model: str, config: str | None = None,
                      load_language_model: str | None = None):
    """Shared CLI loading path (eval/serve): → (model, params, cfg, lm,
    lm_params). Accepts expdirs, checkpoint dirs, or reference ``.pt``."""
    params_np, cfg_dict = load_checkpoint(load_model)
    if config:
        cfg = load_config(config)
    elif cfg_dict is not None:
        cfg = Config(cfg_dict)
    else:
        raise SystemExit("error: no config embedded in checkpoint; pass -c")

    model = build_model(cfg["model"])
    params = jax.tree_util.tree_map(jax.numpy.asarray, params_np)

    lm = lm_params = None
    if load_language_model:
        lm_params_np, lm_cfg = load_checkpoint(load_language_model)
        if lm_cfg is None:
            raise SystemExit(
                f"error: no config.json embedded under {load_language_model}; "
                "re-save the LM checkpoint with its config"
            )
        lm = build_model(Config(lm_cfg)["model"])
        lm_params = jax.tree_util.tree_map(jax.numpy.asarray, lm_params_np)
    return model, params, cfg, lm, lm_params


def main(argv=None) -> int:
    # test/CI escape hatch, same as cli/run.py: sitecustomize pins the TPU
    # backend and ignores JAX_PLATFORMS; force a platform via the config
    if os.environ.get("OT_FORCE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["OT_FORCE_PLATFORM"])
    from . import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    args = build_argparser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s", force=True)
    if args.mode == "greedy":
        args.beam_width = 1

    model, params, cfg, lm, lm_params = load_model_and_lm(
        args.load_model, args.config, args.load_language_model
    )

    idx2unit = load_idx2unit_map(cfg["data"]["vocab"])
    long_form = args.long_form and cfg["model"]["type"] == "speech2text"
    if args.long_form and not long_form:
        logger.warning("--long_form only applies to speech2text models; "
                       "falling back to offline decode")

    # multi-chip decode: replicate params BEFORE the recognizer captures
    # them in its jitted closures; batch rows then shard over 'data' and
    # the beam/greedy loops run SPMD with XLA-inserted collectives
    mesh = None
    if args.ngpu and args.ngpu > 1:
        if args.online or long_form:
            logger.warning("-n %d is ignored with --online/--long_form "
                           "(sequential session decode); using one chip",
                           args.ngpu)
        elif len(jax.devices()) < args.ngpu:
            logger.warning("-n %d requested but only %d devices; using one",
                           args.ngpu, len(jax.devices()))
        else:
            from ..parallel.mesh import make_mesh, replicated

            mesh = make_mesh(n_data=args.ngpu)
            params = jax.device_put(params, replicated(mesh))
            if lm_params is not None:
                lm_params = jax.device_put(lm_params, replicated(mesh))
            logger.info("decoding with batch rows sharded over %d chips", args.ngpu)

    if args.online:
        from ..recognize.online import OnlineRecognizerAdapter

        recognizer = OnlineRecognizerAdapter(
            cfg["model"]["type"], model, params, idx2unit=idx2unit,
            max_per_frame=args.max_tokens_per_chunk,
            beam_width=args.beam_width, max_len=args.max_len,
            penalty=args.penalty, lamda=args.lamda)
    elif long_form:
        from ..recognize.streaming import LongFormRecognizer

        recognizer = LongFormRecognizer(
            model, params, lm=lm, lm_params=lm_params,
            beam_width=args.beam_width, max_len=args.max_len,
            penalty=args.penalty, lamda=args.lamda, lm_weight=args.lm_weight,
            idx2unit=idx2unit, window=args.window, context=args.context,
        )
    else:
        recognizer = build_recognizer(
            cfg["model"]["type"], model, params, lm=lm, lm_params=lm_params,
            args=vars(args), idx2unit=idx2unit,
        )

    def to_device(x):
        a = jax.numpy.asarray(x)
        if mesh is None or a.shape[0] % args.ngpu != 0:
            return a  # ragged tail batches decode replicated
        from ..parallel.mesh import batch_sharding

        return jax.device_put(a, batch_sharding(mesh))

    loader = FeatureLoader(cfg, args.decode_set, is_eval=True, batch_size=args.batch_size)
    targets_dict = getattr(loader.dataset, "targets_dict", {})

    # decode-dir naming from flags (reference eval.py:83-116)
    name = f"decode_{args.decode_set}_bw{args.beam_width}_pn{args.penalty}_ml{args.max_len}"
    if args.load_language_model:
        name += f"_lm{args.lm_weight}"
    if args.suffix:
        name += f"_{args.suffix}"
    ckpt_base = os.path.basename(args.load_model.rstrip("/"))
    m = re.search(r"from(\d+)to(\d+)", ckpt_base)
    if m:
        name += f"_avg{m.group(1)}-{m.group(2)}"
    expdir = args.load_model.rstrip("/")
    if os.path.basename(expdir).startswith("model.") or expdir.endswith(".pt"):
        expdir = os.path.dirname(expdir)
    decode_dir = os.path.join(expdir, name)
    os.makedirs(decode_dir, exist_ok=True)

    cer = ErrorRateAccumulator()
    oracle = ErrorRateAccumulator()
    accu_time = 0.0
    total_frames = 0
    n_decoded = 0

    if args.profile:
        jax.profiler.start_trace(args.profile)
    with open(os.path.join(decode_dir, "predict.txt"), "w", encoding="utf-8") as ftxt, open(
        os.path.join(decode_dir, "predict.log"), "w", encoding="utf-8"
    ) as flog:
        for utt_ids, inputs, targets in loader:
            t0 = time.time()
            if (args.lm_rescore_weight > 0.0 and lm is not None
                    and cfg["model"]["type"] == "speech2text"):
                from ..recognize.base import lm_rescore

                hyp = recognizer.recognize_arrays(
                    to_device(inputs["inputs"]), to_device(inputs["mask"])
                )
                hyp = lm_rescore(recognizer, lm, lm_params, hyp, args.lm_rescore_weight)
                texts = recognizer.nbest_translate(np.asarray(hyp.tokens)[:, :, 1:])
                scores = np.asarray(hyp.scores)
            else:
                texts, scores = recognizer.recognize(
                    to_device(inputs["inputs"]), to_device(inputs["mask"]),
                )
            accu_time += time.time() - t0
            total_frames += int(np.sum(inputs["inputs_length"]))

            for i, utt in enumerate(utt_ids):
                texts[i] = [postprocess(h, args.piece2word) for h in texts[i]]
                if args.sort_by_avg_score and len(texts[i]) > 1:
                    # rank n-best by per-token average score (reference -sba)
                    order = sorted(
                        range(len(texts[i])),
                        key=lambda k: -scores[i][k] / max(len(texts[i][k].split()) + 1, 1))
                    texts[i] = [texts[i][k] for k in order]
                    scores[i] = np.asarray([scores[i][k] for k in order])
                best = texts[i][0]
                ftxt.write(f"{utt} {best}\n")
                ref_ids = targets_dict.get(utt, [])
                ref = postprocess(
                    " ".join(idx2unit.get(t, "<UNK>") for t in ref_ids), args.piece2word
                )
                dists = edit_distances(ref.split(), [h.split() for h in texts[i]])
                cer.update(ref.split(), best.split())
                best_n = int(np.argmin(dists)) if dists else 0
                oracle.update(ref.split(), texts[i][best_n].split())
                for k, (h, s) in enumerate(zip(texts[i], scores[i])):
                    flog.write(f"{utt} nbest{k} score={float(s):.4f} {h}\n")
                n_decoded += 1
            logger.info("decoded %d utts, CER %.2f%%", n_decoded, cer.rate * 100)
            if (args.num_sample and n_decoded >= args.num_sample) or (args.debug and n_decoded >= 10):
                break

    if args.profile:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", args.profile)

    # RTF: frames are 10ms each; reference formula eval.py:198-202
    rtf = accu_time / max(total_frames, 1) * 100
    with open(os.path.join(decode_dir, "RESULT"), "w", encoding="utf-8") as f:
        f.write(f"CER {cer.rate * 100:.2f}% ({cer.errors}/{cer.tokens})\n")
        f.write(f"ORACLE_CER {oracle.rate * 100:.2f}%\n")
        f.write(f"RTF {rtf:.6f}\n")
        f.write(f"UTTS {n_decoded} DECODE_SECONDS {accu_time:.3f}\n")
    logger.info("CER %.2f%% | oracle %.2f%% | RTF %.4f | results in %s",
                cer.rate * 100, oracle.rate * 100, rtf, decode_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
