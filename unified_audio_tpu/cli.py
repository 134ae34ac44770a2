"""Command-line entry points (L9; reference: UniSE train.py / test.py).

    python -m unified_audio_tpu.cli train-unise --config configs/unise.yaml
    python -m unified_audio_tpu.cli train-codec --config configs/hcodec10.yaml
    python -m unified_audio_tpu.cli enhance --mode se --input noisy.wav --output out.wav
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _build_unise(seed: int = 3407):
    """Randomly initialized full-size UniSE stack (checkpoint loading plugs in
    via utils/convert.py when weights are available)."""
    import jax

    from .models.bicodec.tokenizer import BiCodecTokenizer
    from .models.ssl import wav2vec2 as ssl_mod
    from .models.unise.model import UniSE, UniSEConfig
    from .utils.initialization import init_on_cpu

    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    tok = BiCodecTokenizer.from_random(k1)
    wavlm_cfg = ssl_mod.wavlm_base_plus_config()
    wavlm = ssl_mod.Wav2Vec2Model(wavlm_cfg)
    wavlm_vars = init_on_cpu(
        lambda: wavlm.init(k2, np.zeros((1, 16320), np.float32))
    )
    cfg = UniSEConfig()
    return UniSE(cfg, tok, wavlm_cfg, wavlm_vars, rng={"params": k3})


def cmd_train_unise(args):
    import jax

    from .data.data_module import TrainDataIterator
    from .parallel import mesh as mesh_lib
    from .train.checkpoint import CheckpointManager
    from .train.optim import make_optimizer
    from .train.sft_trainer import SFTTrainer
    from .utils.config import load_yaml

    cfg = load_yaml(args.config) if args.config else {}
    unise = _build_unise(cfg.get("seed", 3407))
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

    data = TrainDataIterator(**cfg["dataset"])
    log_every = cfg.get("log_every", 10)
    save_every = cfg.get("save_every", 1000)
    for epoch in range(cfg.get("max_epochs", 100)):
        for batch in data:
            mode, enroll, mix, speech, interf, fs, lens, names = batch
            target = interf if mode == "rtse" else speech
            loss, acc = trainer.train_step(mode, enroll, mix, target)
            if trainer.step % log_every == 0:
                print(json.dumps({"step": trainer.step, "epoch": epoch,
                                  "task": mode, "loss": loss, "acc": acc}))
            if trainer.step % save_every == 0:
                ckpt.save(trainer.step, trainer.params)


def cmd_train_codec(args):
    import jax
    import jax.numpy as jnp

    from .models.hcodec.codec import hcodec10_config
    from .train.codec_trainer import CodecGANTrainer, CodecTrainConfig
    from .utils.config import load_yaml

    cfg = load_yaml(args.config) if args.config else {}
    codec_cfg = hcodec10_config(**cfg.get("codec", {}))
    b = cfg.get("batch_size", 8)
    t = cfg.get("segment_samples", 48000)
    example = (jnp.zeros((b, t)), jnp.zeros((b, t // 320, codec_cfg.feat_dim)))
    trainer = CodecGANTrainer(
        codec_cfg, CodecTrainConfig(**cfg.get("train", {})),
        rng=jax.random.PRNGKey(cfg.get("seed", 0)), example_batch=example,
    )
    print("codec GAN trainer ready; wire a dataset via data.TrainDataIterator "
          "+ an SSL feature extractor to train", file=sys.stderr)


def cmd_enhance(args):
    import jax

    from .data.audio_io import read_wav, write_wav

    # validate inputs BEFORE the (minutes-long) model build
    if not Path(args.input).exists():
        sys.exit(f"error: input file not found: {args.input}")
    if args.mode == "tse" and not args.enroll:
        sys.exit("error: --mode tse requires --enroll <wav>")
    wav, fs = read_wav(args.input)
    enroll_wav = read_wav(args.enroll)[0] if args.enroll else None

    unise = _build_unise()
    rng = jax.random.PRNGKey(args.seed)
    if args.mode == "se":
        est = unise.enhance_se(wav, rng, do_sample=args.sample)
        write_wav(args.output, est, fs)
    elif args.mode == "tse":
        est = unise.enhance_tse(wav, enroll_wav, rng, do_sample=args.sample)
        write_wav(args.output, est, fs)
    else:  # ss
        s1, s2 = unise.separate_ss(wav, rng, do_sample=args.sample)
        out = Path(args.output)
        write_wav(out.with_name(out.stem + "_s1.wav"), s1, fs)
        write_wav(out.with_name(out.stem + "_s2.wav"), s2, fs)
    print("done")


def main(argv=None):
    p = argparse.ArgumentParser(prog="unified_audio_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t1 = sub.add_parser("train-unise")
    t1.add_argument("--config", default=None)
    t1.set_defaults(fn=cmd_train_unise)

    t2 = sub.add_parser("train-codec")
    t2.add_argument("--config", default=None)
    t2.set_defaults(fn=cmd_train_codec)

    t3 = sub.add_parser("enhance")
    t3.add_argument("--mode", choices=["se", "tse", "ss"], default="se")
    t3.add_argument("--input", required=True)
    t3.add_argument("--output", required=True)
    t3.add_argument("--enroll", default=None)
    t3.add_argument("--sample", action="store_true")
    t3.add_argument("--seed", type=int, default=0)
    t3.set_defaults(fn=cmd_enhance)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
