"""Token-corpus pipeline for CodecLM pretraining.

The reference ships the pretraining objective (CustomLlamaModel.forward,
llm.py:107-147) but no data driver for it. This module provides the missing
piece TPU-side: offline tokenization of wav corpora into sharded .npz token
files, and a shuffled, prefetched batch iterator over those shards yielding
exactly what train/pretrain.PretrainTrainer consumes —
``(global_ids (B, Ng), semantic_ids (B, T), cond=None)``.

Shard format: ``.npz`` with two arrays per utterance index i:
``global_{i}`` (Ng,) int32 and ``semantic_{i}`` (T_i,) int32 — variable
semantic lengths are cropped/padded to ``semantic_len`` at batch time
(pretraining clips may be mid-utterance truncations, llm.py:124-127, so a
random crop is correct).
"""
from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


def write_token_shard(path, utterances: Sequence[Tuple[np.ndarray, np.ndarray]]):
    """utterances: list of (global_ids (Ng,), semantic_ids (T,))."""
    arrays = {}
    for i, (g, s) in enumerate(utterances):
        arrays[f"global_{i}"] = np.asarray(g, np.int32)
        arrays[f"semantic_{i}"] = np.asarray(s, np.int32)
    np.savez_compressed(path, **arrays)


def tokenize_corpus(tokenizer, wav_paths: Sequence, out_dir,
                    utterances_per_shard: int = 256,
                    read_wav=None) -> List[Path]:
    """Offline tokenization driver: wavs -> token shards via any tokenizer
    exposing ``tokenize(wav (1, T)) -> (global, semantic)`` (BiCodec layout:
    global (B, 1, Ng) / semantic (B, T))."""
    from .audio_io import read_wav as _read_wav

    read_wav = read_wav or _read_wav
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    shards: List[Path] = []
    buf: List[Tuple[np.ndarray, np.ndarray]] = []

    def flush():
        if not buf:
            return
        p = out_dir / f"tokens_{len(shards):05d}.npz"
        write_token_shard(p, buf)
        shards.append(p)
        buf.clear()

    for wp in wav_paths:
        wav, _ = read_wav(wp)
        g, s = tokenizer.tokenize(wav[:1])
        g = np.asarray(g)
        g = g.reshape(-1) if g.ndim <= 2 else np.asarray(g)[0, 0]
        buf.append((g.astype(np.int32), np.asarray(s)[0].astype(np.int32)))
        if len(buf) >= utterances_per_shard:
            flush()
    flush()
    return shards


def _load_shard(path) -> List[Tuple[np.ndarray, np.ndarray]]:
    with np.load(path) as z:
        n = sum(1 for k in z.files if k.startswith("global_"))
        return [(z[f"global_{i}"], z[f"semantic_{i}"]) for i in range(n)]


class TokenCorpusIterator:
    """Shuffled, prefetched pretraining batches over token shards.

    Yields (global_ids (B, Ng), semantic_ids (B, semantic_len), None)
    forever (epoch wraps). Shards are partitioned over processes by
    ``process_index/process_count`` (the rank-sharding role of
    dataloader/data_module.py:89-94)."""

    def __init__(self, shard_paths: Sequence, batch_size: int,
                 semantic_len: int = 250, seed: int = 0,
                 process_index: int = 0, process_count: int = 1,
                 prefetch: int = 4):
        paths = sorted(str(p) for p in shard_paths)
        self.paths = paths[process_index::process_count]
        if not self.paths:
            raise ValueError("no shards for this process")
        self.batch_size = batch_size
        self.semantic_len = semantic_len
        self.rng = np.random.default_rng(seed + process_index)
        self.prefetch = prefetch

    def _crop(self, s: np.ndarray) -> np.ndarray:
        t = self.semantic_len
        if len(s) >= t:
            off = int(self.rng.integers(0, len(s) - t + 1))
            return s[off : off + t]
        return np.pad(s, (0, t - len(s)), mode="wrap")

    def _batches(self) -> Iterator:
        while True:
            order = self.rng.permutation(len(self.paths))
            for si in order:
                utts = _load_shard(self.paths[si])
                self.rng.shuffle(utts)
                for i in range(0, len(utts) - self.batch_size + 1,
                               self.batch_size):
                    chunk = utts[i : i + self.batch_size]
                    g = np.stack([c[0] for c in chunk]).astype(np.int32)
                    s = np.stack([self._crop(c[1]) for c in chunk]).astype(
                        np.int32)
                    yield g, s, None

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            for item in self._batches():
                if stop.is_set():
                    return
                q.put(item)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
