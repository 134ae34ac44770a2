"""Command-line entry points (L9; reference: UniSE train.py / test.py).

    python -m unified_audio_tpu.cli train-unise --config configs/unise.yaml
    python -m unified_audio_tpu.cli train-codec --config configs/hcodec10.yaml
    python -m unified_audio_tpu.cli enhance --mode se --ckpt CKPT \
        --input noisy.wav --output out.wav
    python -m unified_audio_tpu.cli eval --test-dir DIR --ckpt CKPT
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

TARGET_SR = 16000  # UniSE operates on 16 kHz mono (model/model.py:175-181)

# the FlexiCodec teacher frontend's CMVN stats (a data artifact, loaded from
# the reference checkout when present — see ops/fbank.py)
_REFERENCE_AM_MVN = "/root/reference/QuarkAudio-HCodec/HCodec-1.5/adaptive/am.mvn"


def _load_sft_checkpoint(ckpt: str, llm_cfg):
    """Load LM (LLM_SFT) params from either an orbax checkpoint directory
    (this framework's native format) or a torch .ckpt/.pt file routed through
    utils/convert.convert_custom_llama (reference: test.py:11-30 loads the
    Lightning ckpt; UniSE ckpts contain ONLY the LM weights, model.py:82-91).
    """
    path = Path(ckpt)
    if not path.exists():
        sys.exit(f"error: checkpoint not found: {ckpt}")
    if path.is_dir():
        from .train.checkpoint import CheckpointManager

        mgr = CheckpointManager(path)
        step = mgr.latest_step()
        if step is None:
            sys.exit(f"error: no checkpoint steps inside {ckpt}")
        restored = mgr.restore(step)
        params = restored["params"] if "params" in restored else restored
        print(f"loaded orbax checkpoint step {step} from {ckpt}",
              file=sys.stderr)
        return params
    # torch checkpoint (Lightning .ckpt or raw state dict .pt)
    import torch

    from .utils.convert import convert_custom_llama

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    params = convert_custom_llama(sd, llm_cfg)
    print(f"converted torch checkpoint {ckpt}", file=sys.stderr)
    return params


def _load_bicodec_variables(path: str, cfg):
    """Converted BiCodec weights from the reference's safetensors file (or a
    torch .pt state dict) via utils/convert_bicodec (reference:
    bicodec.py:100 load_from_checkpoint)."""
    p = Path(path)
    if not p.exists():
        sys.exit(f"error: bicodec checkpoint not found: {path}")
    if p.suffix == ".safetensors":
        from safetensors.torch import load_file

        sd = load_file(str(p))
    else:
        import torch

        blob = torch.load(p, map_location="cpu", weights_only=False)
        sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    from .utils.convert_bicodec import convert_bicodec

    print(f"converted BiCodec checkpoint {path}", file=sys.stderr)
    return convert_bicodec(sd, cfg)


def _build_unise(seed: int = 3407, ckpt: str | None = None,
                 bicodec_ckpt: str | None = None):
    """Full-size UniSE stack. With ``ckpt``, the LM weights are restored
    (orbax dir or converted torch file); without, the stack is RANDOMLY
    initialized and a loud warning is emitted — outputs are meaningless."""
    import jax

    from .models.bicodec.tokenizer import BiCodecTokenizer
    from .models.ssl import wav2vec2 as ssl_mod
    from .models.unise.model import UniSE, UniSEConfig
    from .utils.initialization import init_on_cpu

    cfg = UniSEConfig()
    sft_params = _load_sft_checkpoint(ckpt, cfg.llm) if ckpt else None
    if sft_params is None:
        print(
            "WARNING: no --ckpt given — UniSE is RANDOMLY initialized and "
            "the output is not meaningful (smoke/benchmark use only)",
            file=sys.stderr,
        )

    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    tok = BiCodecTokenizer.from_random(k1)
    if bicodec_ckpt:
        tok.variables = _load_bicodec_variables(bicodec_ckpt, tok.config)
    wavlm_cfg = ssl_mod.wavlm_base_plus_config()
    wavlm = ssl_mod.Wav2Vec2Model(wavlm_cfg)
    wavlm_vars = init_on_cpu(
        lambda: wavlm.init(k2, np.zeros((1, 16320), np.float32))
    )
    return UniSE(cfg, tok, wavlm_cfg, wavlm_vars, rng={"params": k3},
                 sft_params=sft_params)


def _prepare_wav(wav: np.ndarray, fs: int, sr: int = TARGET_SR) -> np.ndarray:
    """(channels, T) native-rate -> (1, T) mono at ``sr``. Stereo channels
    must not be flattened into separate segments."""
    if wav.ndim == 1:
        wav = wav[None]
    if wav.shape[0] > 1:
        wav = wav.mean(axis=0, keepdims=True)
    if fs != sr:
        import jax.numpy as jnp

        from .ops.dsp import resample

        wav = np.asarray(resample(jnp.asarray(wav), fs, sr))
        print(f"resampled {fs} Hz -> {sr} Hz", file=sys.stderr)
    return wav.astype(np.float32)


def cmd_train_unise(args):
    import jax

    from .data.data_module import DevicePrefetcher, TrainDataIterator
    from .parallel import mesh as mesh_lib
    from .train.checkpoint import CheckpointManager
    from .train.optim import make_optimizer
    from .train.sft_trainer import SFTTrainer, Validator
    from .utils.config import load_yaml

    cfg = load_yaml(args.config) if args.config else {}
    unise = _build_unise(cfg.get("seed", 3407), ckpt=args.ckpt)
    mesh = mesh_lib.make_mesh(tp=cfg.get("tp", 1)) if jax.device_count() > 1 else None
    trainer = SFTTrainer(unise, mesh=mesh, optimizer=make_optimizer(
        **cfg.get("opt", {})
    ))
    ckpt = CheckpointManager(cfg.get("ckpt_dir", "./checkpoints"))

    # elastic resume: restart from the latest checkpoint automatically
    # (reference: resume key -> trainer.fit(ckpt_path), train.py:38)
    last = ckpt.latest_step()
    if last is not None:
        restored = ckpt.restore(last, template={"params": trainer.params})
        trainer.params = restored["params"]
        trainer.unise.sft_params = trainer.params
        trainer.step = last
        print(f"resumed from step {last}", file=sys.stderr)

    # stage batches on device while the previous step computes (transfers
    # cost >100 ms/step at full size on tunnel-attached chips)
    data = DevicePrefetcher(TrainDataIterator(**cfg["dataset"]))
    # validation cadence (reference validates every 0.5 epoch and saves a
    # manual ckpt at each val-epoch end, model.py:160-168; here the cadence
    # is step-based: val_every steps -> run Validator + save checkpoint)
    val_iter = (TrainDataIterator(**cfg["val_dataset"])
                if "val_dataset" in cfg else None)
    validator = Validator(unise) if val_iter is not None else None
    val_every = cfg.get("val_every", 1000)
    val_batches = cfg.get("val_batches", 16)
    log_every = cfg.get("log_every", 10)
    save_every = cfg.get("save_every", 1000)
    # persistent train/val curves (reference: TensorBoardLogger,
    # UniSE train.py:18) — JSONL beside the checkpoints, stdout echo
    from .utils.logging import MetricsLogger

    log_path = cfg.get(
        "metrics_log",
        str(Path(cfg.get("ckpt_dir", "./checkpoints")) / "metrics.jsonl"))
    with MetricsLogger(log_path) as mlog:
        for epoch in range(cfg.get("max_epochs", 100)):
            for batch in data:
                mode, enroll, mix, speech, interf, fs, lens, names = batch
                target = interf if mode == "rtse" else speech
                loss, acc = trainer.train_step(mode, enroll, mix, target)
                if trainer.step % log_every == 0:
                    mlog.log(trainer.step, epoch=epoch, task=mode,
                             loss=loss, acc=acc)
                if validator is not None and trainer.step % val_every == 0:
                    import itertools

                    stats = validator.run(
                        trainer.params,
                        itertools.islice(iter(val_iter), val_batches),
                    )
                    mlog.log(trainer.step, **stats)
                    ckpt.save(trainer.step, trainer.params)
                elif trainer.step % save_every == 0:
                    ckpt.save(trainer.step, trainer.params)


def cmd_train_codec(args):
    import jax
    import jax.numpy as jnp

    from .models.hcodec.codec import hcodec10_config, hcodec20_config
    from .train.codec_trainer import CodecGANTrainer, CodecTrainConfig
    from .utils.config import load_yaml

    cfg = load_yaml(args.config) if args.config else {}
    builders = {"hcodec10": hcodec10_config, "hcodec20": hcodec20_config}
    model = cfg.get("model", "hcodec10")
    if model not in builders:
        sys.exit(f"error: unknown codec model {model!r}; "
                 f"choose from {sorted(builders)}")
    codec_cfg = builders[model](**cfg.get("codec", {}))
    b = cfg.get("batch_size", 8)
    t = cfg.get("segment_samples", 48000)
    # SSL features run at 50 Hz on the 16 kHz (re)sampled audio
    feat_frames = t * 50 // codec_cfg.sample_rate
    example = (jnp.zeros((b, t)),
               jnp.zeros((b, feat_frames, codec_cfg.feat_dim)))
    trainer = CodecGANTrainer(
        codec_cfg, CodecTrainConfig(**cfg.get("train", {})),
        rng=jax.random.PRNGKey(cfg.get("seed", 0)), example_batch=example,
    )
    if "dataset" not in cfg:
        sys.exit("error: config needs a 'dataset' section "
                 "(data.hcodec_data.DomainWeightedIterator kwargs: "
                 "domain_scps, batch_size, cut_seconds, ...)")

    from .data.hcodec_data import DomainWeightedIterator
    from .models.ssl import wav2vec2 as ssl_mod
    from .ops.dsp import resample
    from .train.checkpoint import CheckpointManager
    from .utils.initialization import init_on_cpu

    data = DomainWeightedIterator(
        sample_rate=codec_cfg.sample_rate,
        batch_size=b, cut_seconds=t / codec_cfg.sample_rate,
        **cfg["dataset"])
    # frozen HuBERT semantic targets (HCodec-1.0/audio_tokenizer.py:35-48;
    # 2.0 computes them on the 48k->16k resample, audio_tokenizer.py:41,50)
    # "ssl" config section overrides the frontend size (tiny test stacks)
    ssl_cfg = (ssl_mod.SSLConfig(**cfg["ssl"]) if "ssl" in cfg
               else ssl_mod.hubert_base_config())
    ssl = ssl_mod.Wav2Vec2Model(ssl_cfg)
    ssl_vars = init_on_cpu(
        lambda: ssl.init(jax.random.PRNGKey(1),
                         np.zeros((1, 16320), np.float32)))

    want_frames = t * 50 // codec_cfg.sample_rate

    @jax.jit
    def feats_fn(ssl_vars, wav16):
        f = ssl_mod.hubert_features(ssl.apply(ssl_vars, wav16))
        # SSL conv framing yields ~T/320 +- edge frames; the codec needs
        # exactly 2 semantic frames per acoustic frame — edge-pad/trim
        pad = max(want_frames - f.shape[1], 0)  # static under jit
        f = jnp.pad(f, ((0, 0), (0, pad), (0, 0)), mode="edge")
        return f[:, :want_frames]

    ckpt = CheckpointManager(cfg.get("ckpt_dir", "./codec_checkpoints"))
    log_every = cfg.get("log_every", 10)
    save_every = cfg.get("save_every", 1000)
    rng_np = np.random.default_rng(cfg.get("seed", 0))
    from .utils.logging import MetricsLogger

    log_path = cfg.get(
        "metrics_log",
        str(Path(cfg.get("ckpt_dir", "./codec_checkpoints"))
            / "metrics.jsonl"))
    print("codec GAN training started", file=sys.stderr)
    with MetricsLogger(log_path) as mlog:
        for epoch in range(cfg.get("max_epochs", 100)):
            for wav, domains in data:
                wav = jnp.asarray(wav)
                wav16 = (wav if codec_cfg.sample_rate == 16000
                         else resample(wav, codec_cfg.sample_rate, 16000))
                feat = feats_fn(ssl_vars, wav16)
                step_rng = jax.random.PRNGKey(int(rng_np.integers(2**31)))
                metrics = trainer.train_step(wav, feat, step_rng)
                if trainer.step % log_every == 0:
                    mlog.log(trainer.step, epoch=epoch,
                             **{k: round(v, 5) for k, v in metrics.items()})
                if trainer.step % save_every == 0:
                    ckpt.save(trainer.step, {"gen": trainer.gen_vars,
                                             "disc": trainer.disc_params})
                if trainer.step >= cfg.get("max_steps", 1_000_000):
                    break
            if trainer.step >= cfg.get("max_steps", 1_000_000):
                break
    ckpt.save(trainer.step, {"gen": trainer.gen_vars,
                             "disc": trainer.disc_params})


def cmd_enhance(args):
    import jax

    from .data.audio_io import read_wav, write_wav

    # validate inputs BEFORE the (minutes-long) model build
    if not Path(args.input).exists():
        sys.exit(f"error: input file not found: {args.input}")
    if args.mode == "tse" and not args.enroll:
        sys.exit("error: --mode tse requires --enroll <wav>")
    if args.ckpt and not Path(args.ckpt).exists():
        sys.exit(f"error: checkpoint not found: {args.ckpt}")
    wav, fs = read_wav(args.input)
    wav = _prepare_wav(wav, fs)
    enroll_wav = None
    if args.enroll:
        e, efs = read_wav(args.enroll)
        enroll_wav = _prepare_wav(e, efs)

    unise = _build_unise(ckpt=args.ckpt,
                         bicodec_ckpt=getattr(args, "bicodec_ckpt", None))
    rng = jax.random.PRNGKey(args.seed)
    if args.mode == "se":
        est = unise.enhance_se(wav, rng, do_sample=args.sample)
        write_wav(args.output, est, TARGET_SR)
    elif args.mode == "tse":
        est = unise.enhance_tse(wav, enroll_wav, rng, do_sample=args.sample)
        write_wav(args.output, est, TARGET_SR)
    else:  # ss
        s1, s2 = unise.separate_ss(wav, rng, do_sample=args.sample)
        out = Path(args.output)
        write_wav(out.with_name(out.stem + "_s1.wav"), s1, TARGET_SR)
        write_wav(out.with_name(out.stem + "_s2.wav"), s2, TARGET_SR)
    print("done" + ("" if args.ckpt else " (random weights)"))


def cmd_codec(args):
    """Codec round-trip inference driver (the adaptive/infer.py:10-212
    equivalent): load weights -> tokenize -> detokenize -> wav."""
    import jax
    import jax.numpy as jnp

    from .data.audio_io import read_wav, write_wav

    if not Path(args.input).exists():
        sys.exit(f"error: input file not found: {args.input}")
    if args.ckpt and not Path(args.ckpt).exists():
        sys.exit(f"error: checkpoint not found: {args.ckpt}")
    wav, fs = read_wav(args.input)
    sr = 48000 if args.model == "hcodec20" else TARGET_SR
    wav = _prepare_wav(wav, fs, sr)

    if args.model == "flexicodec":
        from .models.hcodec.flexicodec import (
            FlexiCodec, FlexiCodecConfig, fbank_semantic, match_frame_rate,
            sensevoice_semantic, sensevoice_teacher_semantic)

        # load the checkpoint FIRST: its convnext_encoder input projection
        # fixes ssl_dim (the semantic stream below must be built at the
        # converted width, not the config default)
        sd = None
        if args.ckpt:
            import torch

            sd = torch.load(args.ckpt, map_location="cpu",
                            weights_only=False) \
                if not str(args.ckpt).endswith(".safetensors") else None
            if sd is None:
                from safetensors.torch import load_file

                sd = load_file(args.ckpt)
            sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        cfg_kw = dict(sample_rate=TARGET_SR)
        if sd is not None:
            w = sd.get("convnext_encoder.0.weight_v",
                       sd.get("convnext_encoder.0.weight"))
            if w is not None:
                cfg_kw["ssl_dim"] = int(w.shape[1])
        cfg = FlexiCodecConfig(**cfg_kw)
        model = FlexiCodec(cfg)
        x = jnp.asarray(wav)
        # semantic stream, best teacher available: the FULL ported SAN-M
        # encoder when its weights are supplied (--sensevoice-ckpt, exactly
        # the reference's in-line semantic_model); else the exact teacher
        # frontend (funasr WavFrontend, ops/fbank.py) when its am.mvn stats
        # are reachable (--cmvn or the reference checkout); else the
        # generic log-fbank fallback.
        cmvn = getattr(args, "cmvn", None) or (
            _REFERENCE_AM_MVN if os.path.exists(_REFERENCE_AM_MVN) else None)
        sv_ckpt = getattr(args, "sensevoice_ckpt", None)
        if sv_ckpt:
            if not cmvn:
                sys.exit("error: --sensevoice-ckpt needs CMVN stats "
                         "(--cmvn or the reference checkout's am.mvn)")
            import torch

            from .models.ssl.sanm import sensevoice_small_config
            from .utils.convert import convert_sensevoice

            sv_cfg = sensevoice_small_config()
            sv_vars = convert_sensevoice(
                torch.load(sv_ckpt, map_location="cpu", weights_only=False),
                sv_cfg)
            sem = sensevoice_teacher_semantic(
                sv_vars, x, cmvn, config=sv_cfg, sample_rate=TARGET_SR,
                out_dim=cfg.ssl_dim)
            print(f"SAN-M teacher semantic stream from {sv_ckpt}",
                  file=sys.stderr)
        elif cmvn:
            sem = sensevoice_semantic(x, cmvn, out_dim=cfg.ssl_dim,
                                      sample_rate=TARGET_SR)
        else:
            sem = fbank_semantic(x, sample_rate=TARGET_SR,
                                 out_dim=cfg.ssl_dim)
        # the model consumes the semantic stream at 2x the acoustic frame
        # rate (internal /2 downsample + min-trim vs acoustic latents);
        # teacher frontends run at their own rates, so rate-match here or
        # the trim truncates the reconstruction to the shorter stream
        sem = match_frame_rate(sem, 2 * (wav.shape[-1] // cfg.hop_length))
        if sd is not None:
            from .utils.convert_hcodec import convert_flexicodec

            variables = convert_flexicodec(sd, cfg)
            print(f"converted FlexiCodec weights from {args.ckpt} "
                  f"(ssl_dim={cfg.ssl_dim})", file=sys.stderr)
        else:
            print("WARNING: random weights — reconstruction is not "
                  "meaningful", file=sys.stderr)
            from .utils.initialization import init_on_cpu

            # init on the host CPU (one jitted program + one transfer);
            # eager init over a tunnel-attached chip dispatches thousands
            # of individual ops (CLAUDE.md gotcha). Real inputs keep any
            # data-dependent init (k-means codebooks) meaningful.
            sem_host = np.asarray(sem)
            x_host = np.asarray(wav, np.float32)
            variables = init_on_cpu(
                lambda: model.init(jax.random.PRNGKey(0), x_host, sem_host,
                                   train=False))
        # jitted with variables as ARGUMENTS (closure constants blow the
        # remote-compile body limit; eager apply is a round trip per op)
        enc = jax.jit(lambda v, xx, ss: model.apply(v, xx, ss,
                                                    method="encode"))
        dec = jax.jit(lambda v, a, s: model.apply(v, a, s, method="decode"))
        ac, semc = enc(variables, x, sem)
        rec = np.asarray(dec(variables, ac, semc))[0]
        rate = float(ac.shape[1]) / (wav.shape[-1] / TARGET_SR)
    elif args.model == "hcodec15":
        from .models.hcodec.adaptive import adaptive15_config
        from .models.hcodec.adaptive_tokenizer import AdaptiveHCodecTokenizer
        from .utils.convert_hcodec import convert_hcodec15

        cfg = adaptive15_config()
        if args.ckpt:
            import torch

            from .models.ssl import wav2vec2 as ssl_mod

            sd = torch.load(args.ckpt, map_location="cpu", weights_only=False)
            sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
            codec_vars = convert_hcodec15(sd, cfg)
            rnd = AdaptiveHCodecTokenizer.from_random(
                jax.random.PRNGKey(0), cfg)
            tok = AdaptiveHCodecTokenizer(
                cfg, codec_vars, ssl_mod.wav2vec2_large_xlsr53_config(),
                rnd.ssl_variables)
            print(f"converted HCodec-1.5 weights from {args.ckpt} (SSL "
                  "frontend remains HF-random unless converted separately)",
                  file=sys.stderr)
        else:
            print("WARNING: random weights — reconstruction is not "
                  "meaningful", file=sys.stderr)
            tok = AdaptiveHCodecTokenizer.from_random(
                jax.random.PRNGKey(0), cfg)
        codes = tok.tokenize(jnp.asarray(wav))
        ac = codes["acoustic_codes"]
        rec = np.asarray(tok.detokenize(ac, codes["semantic_codes"]))[0]
        # realized adaptive rate (groups/s), not the fixed 25 Hz
        rate = float(np.asarray(codes["token_rate_hz"]).mean())
    else:  # hcodec10 / hcodec20
        from .models.hcodec.codec import hcodec10_config, hcodec20_config
        from .models.hcodec.tokenizer import HCodecTokenizer
        from .utils.convert_hcodec import convert_hcodec10, convert_hcodec20

        cfg_fn, conv_fn = ((hcodec20_config, convert_hcodec20)
                           if args.model == "hcodec20"
                           else (hcodec10_config, convert_hcodec10))
        cfg = cfg_fn()
        dtype = jnp.bfloat16 if getattr(args, "dtype",
                                        "float32") == "bfloat16" else None
        if args.ckpt:
            import torch

            from .models.ssl import wav2vec2 as ssl_mod

            sd = torch.load(args.ckpt, map_location="cpu", weights_only=False)
            sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
            codec_vars = conv_fn(sd, cfg)
            rnd = HCodecTokenizer.from_random(jax.random.PRNGKey(0), cfg)
            tok = HCodecTokenizer(cfg, codec_vars,
                                  ssl_mod.hubert_base_config(),
                                  rnd.ssl_variables, dtype=dtype)
            print(f"converted HCodec weights from {args.ckpt} (SSL frontend "
                  "remains HF-random unless converted separately)",
                  file=sys.stderr)
        else:
            print("WARNING: random weights — reconstruction is not "
                  "meaningful", file=sys.stderr)
            tok = HCodecTokenizer.from_random(jax.random.PRNGKey(0), cfg)
            if dtype is not None:
                tok = HCodecTokenizer(cfg, tok.codec_variables,
                                      tok.ssl.config, tok.ssl_variables,
                                      dtype=dtype)
        x = jnp.asarray(wav)
        ac, sem = tok.tokenize(x)
        rec = np.asarray(tok.detokenize(ac, sem))[0]
        rate = float(ac.shape[1]) / (wav.shape[-1] / sr)

    write_wav(args.output, rec, sr)
    print(json.dumps({"model": args.model, "tokens_per_sec": round(rate, 2),
                      "acoustic_shape": list(np.asarray(ac).shape),
                      "out": str(args.output)}))


def cmd_serve(args):
    """Continuous-batching batch server: a JSONL request file streams
    through the paged-KV engine (mixed SE/TSE/rTSE in one pool).

    Each line: {"uid": int, "task": "se"|"tse"|"rtse"|"ss", "mix":
    "path.wav", "enroll": "path.wav"(tse/rtse), "output": "out.wav",
    "temperature"/"top_k"/"top_p"/"do_sample" optional}.

    "ss" requests run the separation CASCADE through the same pool
    (serve/cascade.py): the SE phase rides the first admission waves with
    the regular traffic, the enhanced enrollment is staged on device, and
    the TSE/rTSE phases write <output>_s1.wav / <output>_s2.wav."""
    import jax
    import jax.numpy as jnp

    from .data.audio_io import read_wav, write_wav

    if not Path(args.requests).exists():
        sys.exit(f"error: request file not found: {args.requests}")
    lines = [json.loads(l) for l in Path(args.requests).read_text().splitlines()
             if l.strip()]
    if not lines:
        sys.exit("error: no requests")
    for l in lines:
        if not Path(l["mix"]).exists():
            sys.exit(f"error: mix wav not found: {l['mix']}")
        if l.get("task", "se") in ("tse", "rtse") and not l.get("enroll"):
            sys.exit(f"error: task {l.get('task')} requires 'enroll'")

    from .models.lm.llama import LlamaConfig  # noqa: F401 (doc anchor)
    from .serve.engine import ContinuousBatchingEngine, Request

    unise = _build_unise(ckpt=args.ckpt)
    cfg = unise.config
    task_map = {"se": 0, "tse": 1, "rtse": 2}
    seg = cfg.segment_len
    sem_len = unise._semantic_len()

    # one Request per 5-s segment; mixed tasks share the pool. The mix
    # rides the link as RAW int16 SAMPLES (waveform admission: the WavLM
    # frontend runs batched inside the prefill program — no host-side
    # feature round trip, ~6x fewer host->device bytes than fp32 frames on
    # the measured ~70 MB/s link). Enroll clips stay EXACT-LENGTH
    # precomputed features: WavLM's global attention would compute
    # different features for bucket-padded audio (hybrid requests,
    # serve/engine.py _signature).
    reqs, meta = [], {}
    ss_lines = []
    uid = 0
    for l in lines:
        wav, fs = read_wav(l["mix"])
        wav = _prepare_wav(wav, fs)
        if l.get("task", "se") == "ss":
            ss_lines.append((l, wav))
            continue
        segs, orig_len = unise._segment(wav)
        peak = np.abs(wav).max() or 1.0
        segs = np.asarray(segs) / peak
        enroll_feats = enroll_wav = None
        if l.get("enroll"):
            e, efs = read_wav(l["enroll"])
            e = _prepare_wav(e, efs)[:, :seg]
            e = e / (np.abs(e).max() or 1.0)
            if e.shape[-1] == seg:
                # exactly one segment (enrolls >= 5 s truncate to this):
                # the sample bucket is EXACT, so the in-prefill frontend
                # computes identical features — ride the cheap sample wire
                enroll_wav = np.asarray(e)[0]
            else:
                enroll_feats = np.asarray(unise.extract_semantic_features(
                    jnp.asarray(e)))[0]
        seg_uids = []
        for i in range(segs.shape[0]):
            reqs.append(Request(
                task_id=task_map[l.get("task", "se")], mix_wav=segs[i],
                enroll_feats=enroll_feats, enroll_wav=enroll_wav,
                global_length=cfg.global_tokens, semantic_length=sem_len,
                temperature=l.get("temperature", 0.8),
                top_k=l.get("top_k", 50), top_p=l.get("top_p", 0.95),
                do_sample=l.get("do_sample", True), uid=uid))
            seg_uids.append(uid)
            uid += 1
        meta[l["output"]] = (seg_uids, orig_len)

    eng = ContinuousBatchingEngine(
        unise.sft, unise.sft_params, num_slots=args.slots,
        max_global=cfg.global_tokens, max_semantic=sem_len + 6,
        mix_buckets=(sem_len + 6,), dtype=jnp.bfloat16 if args.bf16 else None,
        feature_fn=unise.wavlm_feats_pure,
        feature_params=unise.wavlm_variables,
        wav_buckets=(seg,),
        kv_quant=(args.kv_quant or None),
    )
    if ss_lines:
        from .serve.cascade import SSCascadeRunner

        runner = SSCascadeRunner(eng, unise)
        ss_reqs, ss_meta = [], {}
        for j, (l, wav) in enumerate(ss_lines):
            r = runner.make(
                wav, uid=10_000_000 + j,
                temperature=l.get("temperature", 0.8),
                top_k=l.get("top_k", 50), top_p=l.get("top_p", 0.95),
                do_sample=l.get("do_sample", True))
            ss_reqs.append(r)
            ss_meta[l["output"]] = r
        cres, results = runner.run(ss_reqs, jax.random.PRNGKey(args.seed),
                                   extra=reqs)
        for out_path, r in ss_meta.items():
            s1, s2 = runner.assemble(r, cres[r.uid])
            out = Path(out_path)
            write_wav(out.with_name(out.stem + "_s1.wav"), s1, TARGET_SR)
            write_wav(out.with_name(out.stem + "_s2.wav"), s2, TARGET_SR)
    else:
        results = eng.run(reqs, jax.random.PRNGKey(args.seed))

    for out_path, (seg_uids, orig_len) in meta.items():
        g = np.stack([results[u].global_ids for u in seg_uids])
        s = np.stack([results[u].semantic_ids for u in seg_uids])
        est = unise._decode_tokens(jnp.asarray(g), jnp.asarray(s), orig_len)
        write_wav(out_path, est, TARGET_SR)
    print(json.dumps({"requests": len(lines), "segments": len(reqs),
                      "outputs": list(meta), "engine_stats": eng.stats()}))


def cmd_eval(args):
    """Directory evaluation harness (reference: test.py + trainer.test over
    benchmark dirs, conf/config.yaml:62-105)."""
    import jax

    from .eval.runner import EvalConfig, evaluate

    if not Path(args.test_dir).exists():
        sys.exit(f"error: test dir not found: {args.test_dir}")
    if args.ckpt and not Path(args.ckpt).exists():
        sys.exit(f"error: checkpoint not found: {args.ckpt}")

    unise = _build_unise(ckpt=args.ckpt, bicodec_ckpt=args.bicodec_ckpt)
    cfg = EvalConfig(mode=args.mode, data_src_dir=args.test_dir,
                     data_tgt_dir=args.tgt_dir, data_enroll_dir=args.enroll_dir,
                     save_enhanced=args.save_enhanced, limit=args.max_items)
    # SPK-SIM scores through the BiCodec ECAPA x-vector branch — only
    # meaningful with converted speaker weights, so it is gated on
    # --bicodec-ckpt (or forced with --spk-sim, which warns loudly)
    utmos_pred = None
    if args.utmos_ckpt:
        import torch

        from .eval.utmos import UTMOSPredictor, convert_utmos
        from .models.ssl import wav2vec2 as ssl_mod
        from .utils.convert import convert_hf_wav2vec2

        blob = torch.load(args.utmos_ckpt, map_location="cpu",
                          weights_only=False)
        sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
        pred = UTMOSPredictor.from_random(jax.random.PRNGKey(0))
        pred.head_variables = convert_utmos(sd, pred.cfg)
        ssl_keys = {k[len("ssl_model."):]: v for k, v in sd.items()
                    if k.startswith("ssl_model.")}
        if ssl_keys:
            pred.ssl_variables = convert_hf_wav2vec2(
                ssl_keys, ssl_mod.hubert_base_config())
            print(f"converted UTMOS head + SSL backbone from "
                  f"{args.utmos_ckpt}", file=sys.stderr)
        else:
            print("WARNING: UTMOS ckpt has no ssl_model.* weights — the "
                  "SSL backbone stays random; convert it separately",
                  file=sys.stderr)
        utmos_pred = pred
    spk = None
    if args.bicodec_ckpt or args.spk_sim:
        from .eval.metrics import make_spk_embed_fn

        if not args.bicodec_ckpt:
            print("WARNING: --spk-sim without --bicodec-ckpt: SPK-SIM will "
                  "be computed with RANDOM ECAPA weights and is meaningless",
                  file=sys.stderr)
        spk = make_spk_embed_fn(unise.tokenizer.model,
                                unise.tokenizer.variables)
    else:
        print("note: SPK-SIM skipped (pass --bicodec-ckpt for converted "
              "speaker weights, or --spk-sim to force)", file=sys.stderr)
    stats = evaluate(unise, cfg, rng=jax.random.PRNGKey(args.seed),
                     spk_embed_fn=spk, utmos_predictor=utmos_pred)
    print(json.dumps(stats))


def main(argv=None):
    p = argparse.ArgumentParser(prog="unified_audio_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t1 = sub.add_parser("train-unise")
    t1.add_argument("--config", default=None)
    t1.add_argument("--ckpt", default=None,
                    help="initial LM weights (orbax dir or torch ckpt)")
    t1.set_defaults(fn=cmd_train_unise)

    t2 = sub.add_parser("train-codec")
    t2.add_argument("--config", default=None)
    t2.set_defaults(fn=cmd_train_codec)

    t3 = sub.add_parser("enhance")
    t3.add_argument("--mode", choices=["se", "tse", "ss"], default="se")
    t3.add_argument("--input", required=True)
    t3.add_argument("--output", required=True)
    t3.add_argument("--enroll", default=None)
    t3.add_argument("--ckpt", default=None,
                    help="LM weights (orbax dir or torch ckpt); omitting "
                         "runs RANDOM weights with a loud warning")
    t3.add_argument("--bicodec-ckpt", default=None,
                    help="converted BiCodec weights (safetensors or .pt)")
    t3.add_argument("--sample", action="store_true")
    t3.add_argument("--seed", type=int, default=0)
    t3.set_defaults(fn=cmd_enhance)

    t5 = sub.add_parser("codec")
    t5.add_argument("--model", choices=["hcodec10", "hcodec15", "hcodec20", "flexicodec"],
                    default="hcodec10")
    t5.add_argument("--input", required=True)
    t5.add_argument("--output", required=True)
    t5.add_argument("--cmvn", default=None,
                    help="Kaldi CMVN stats (am.mvn) for the exact "
                         "flexicodec teacher frontend; defaults to the "
                         "reference checkout's copy when present")
    t5.add_argument("--ckpt", default=None,
                    help="torch weights.pt (convert_hcodec10/20 by --model)")
    t5.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="bfloat16 = serving mode for hcodec10/hcodec20: "
                    "bf16 weights+activations with fp32 VQ/ISTFT islands "
                    "(models/hcodec/tokenizer.py)")
    t5.add_argument("--sensevoice-ckpt", default=None,
                    help="funasr SenseVoiceSmall state dict: run the FULL "
                         "ported SAN-M teacher for the flexicodec semantic "
                         "stream (models/ssl/sanm.py) instead of the "
                         "frontend-only features")
    t5.set_defaults(fn=cmd_codec)

    t6 = sub.add_parser("serve")
    t6.add_argument("--requests", required=True,
                    help="JSONL request file (see cmd_serve docstring)")
    t6.add_argument("--ckpt", default=None)
    t6.add_argument("--slots", type=int, default=16)  # measured sweet spot
    # with the Pallas stream kernel (benchmarks/RESULTS.json round 3)
    t6.add_argument("--bf16", action="store_true", default=True)
    t6.add_argument("--kv-quant", choices=["", "int8"], default="",
                    help="int8 KV block pool (half the pool HBM; through "
                         "the owner kernel also the faster decode — "
                         "docs/PERFORMANCE.md)")
    t6.add_argument("--seed", type=int, default=0)
    t6.set_defaults(fn=cmd_serve)

    t4 = sub.add_parser("eval")
    t4.add_argument("--test-dir", required=True)
    t4.add_argument("--tgt-dir", default=None,
                    help="clean references (enables STOI/PESQ/SI-SNR)")
    t4.add_argument("--enroll-dir", default=None)
    t4.add_argument("--mode", choices=["se", "tse", "ss"], default="se")
    t4.add_argument("--ckpt", default=None)
    t4.add_argument("--bicodec-ckpt", default=None,
                    help="converted BiCodec weights (safetensors or .pt); "
                         "enables a meaningful SPK-SIM")
    t4.add_argument("--spk-sim", action="store_true",
                    help="force SPK-SIM even with random speaker weights")
    t4.add_argument("--utmos-ckpt", default=None,
                    help="converted UTMOS checkpoint (torch); switches the "
                         "MOS column from the proxy to learned UTMOS")
    t4.add_argument("--save-enhanced", default=None)
    t4.add_argument("--max-items", type=int, default=None)
    t4.add_argument("--seed", type=int, default=0)
    t4.set_defaults(fn=cmd_eval)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
