"""SCP-driven training data pipeline with threaded prefetch.

Equivalent of UniSE dataloader/data_module.py: kaldi-style SCP parsing
(WaveInfo:26-46), speaker-paired sampling (two utterances of the target
speaker, one of an interfering speaker), per-batch random task
in {se, tse, rtse}, ThreadPoolExecutor workers feeding a bounded queue, and
host sharding by ``jax.process_index()`` (replacing the torch.distributed
rank sharding at data_module.py:89-94, 280-291).
"""
from __future__ import annotations

import collections
import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from . import simulation
from .audio_io import read_wav


@dataclass
class WaveInfo:
    """One SCP line. speech: 'utt spk path'; noise: 'utt fs start frames path';
    rir: 'utt path'."""

    utt: str
    path: str
    spk: str = "unknown"
    fs: Optional[int] = None
    offset: float = 0.0
    duration: Optional[float] = None

    @classmethod
    def parse(cls, line: str, kind: str) -> "WaveInfo":
        parts = line.strip().split(" ")
        if kind == "rir":
            utt, path = parts
            return cls(utt=utt, path=path)
        if kind == "speech":
            utt, spk, path = parts
            return cls(utt=utt, spk=spk, path=path)
        if kind == "noise":
            utt, fs, start, frames, path = parts
            fs = int(float(fs))
            return cls(utt=utt, path=path, fs=fs,
                       offset=float(start) / fs, duration=float(frames) / fs)
        raise ValueError(kind)


def load_scp(scp_paths, kind: str, base_dir: str = "") -> List[WaveInfo]:
    if not isinstance(scp_paths, (list, tuple)):
        scp_paths = [scp_paths]
    out = []
    for p in scp_paths:
        with open(p) as f:
            for line in f:
                if line.strip():
                    info = WaveInfo.parse(line, kind)
                    if base_dir:
                        info.path = str(Path(base_dir) / info.path)
                    out.append(info)
    return out


def pad_or_cut(wav: np.ndarray, length: int, offset: Optional[int],
               rng: random.Random):
    if wav.shape[-1] < length:
        return np.pad(wav, [(0, 0), (0, length - wav.shape[-1])],
                      mode="wrap"), None
    if offset is None:
        offset = rng.randint(0, wav.shape[-1] - length)
    return wav[..., offset : offset + length], offset


def normalize_src_tgt(src, tgt, rng: random.Random, low=0.1, high=0.99):
    max_tgt = np.max(np.abs(tgt)) + 1e-5
    max_src = np.max(np.abs(src)) + 1e-5
    threshold = high / max(max_tgt, max_src)
    target = rng.uniform(low, high)
    factor = min(target / max_tgt, threshold)
    return src * factor, tgt * factor


def normalize_mix_speech_interf(mix, speech, interf, rng: random.Random,
                                low=0.1, high=0.99):
    a, b, c = (np.max(np.abs(x)) for x in (mix, speech, interf))
    max_v = max(a, b, c) + 1e-5
    min_v = min(a, b, c)
    factor = high / max_v
    if min_v * factor > low:
        factor = rng.uniform(low / (min_v * factor), 1.0) * factor
    return mix * factor, speech * factor, interf * factor


class TrainDataIterator:
    """Yields (mode, enroll, mix, speech, interf, fs, lengths, names) batches
    of host numpy arrays."""

    def __init__(
        self,
        speech_scp: Union[str, Sequence[str]],
        noise_scp: Union[str, Sequence[str]],
        rir_scp: Union[str, Sequence[str]],
        speech_base_dir: str = "",
        batch_size: int = 8,
        cut_duration: Union[float, Sequence[float]] = 5.0,
        enroll_duration: float = 5.0,
        num_workers: int = 4,
        prefetch: int = 2,
        samples_per_epoch: int = 10000,
        simulation_config: Optional[Dict] = None,
        seed: int = 0,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.batch_size = batch_size
        self.cut_duration = cut_duration
        self.enroll_duration = enroll_duration
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.samples_per_epoch = samples_per_epoch
        self.sim_config = simulation_config or simulation.DEFAULT_SIM_CONFIG

        if process_index is None:
            try:
                import jax
                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        self.rank, self.world_size = process_index, process_count
        self.rng = random.Random(seed + 1000 * self.rank)
        self.nprng = np.random.default_rng(seed + 1000 * self.rank)

        self.speech_list = load_scp(speech_scp, "speech", speech_base_dir)
        self.spk2speech = collections.defaultdict(list)
        for info in self.speech_list:
            self.spk2speech[info.spk].append(info)
        self.spk_list = [s for s, v in self.spk2speech.items() if len(v) > 1]
        assert self.spk_list, "need speakers with >=2 utterances"
        self.noise_list = load_scp(noise_scp, "noise")
        self.rir_list = load_scp(rir_scp, "rir")

    def _load(self, info: WaveInfo) -> np.ndarray:
        wav, fs = read_wav(info.path)
        wav = wav[:1]
        if info.duration is not None:
            start = int(info.offset * fs)
            end = start + int(info.duration * fs)
            wav = wav[:, start:end]
        return wav

    def _one_sample(self, fs: int, cut_duration: float, mode: str):
        rng = self.rng
        spk1, spk2 = rng.sample(self.spk_list, 2)
        speech_info, enroll_info = rng.sample(self.spk2speech[spk1], 2)
        interf_info = rng.choice(self.spk2speech[spk2])

        for _ in range(3):  # retry-on-exception (data_module.py:181-199)
            try:
                speech = self._load(speech_info)
                enroll = interf = None
                if mode in ("tse", "rtse"):
                    enroll = self._load(enroll_info)
                    interf = self._load(interf_info)
                elif rng.random() < self.sim_config["se_interference"]["prob"]:
                    interf = self._load(interf_info)
                break
            except Exception:
                speech_info = rng.choice(self.spk2speech[rng.choice(self.spk_list)])
                continue
        else:
            raise RuntimeError("failed to load speech sample")

        noise = self._load(rng.choice(self.noise_list)) if self.noise_list else None
        rir = self._load(rng.choice(self.rir_list)) if self.rir_list else None

        mix, speech, interf = simulation.simulate_data(
            mode, speech, interf, noise, rir, fs, self.sim_config, self.nprng
        )
        length = int(cut_duration * fs)
        mix, offset = pad_or_cut(mix, length, None, rng)
        speech, _ = pad_or_cut(speech, length, offset, rng)
        if interf is not None:
            interf, _ = pad_or_cut(interf, length, offset, rng)
            mix, speech, interf = normalize_mix_speech_interf(
                mix, speech, interf, rng
            )
        else:
            mix, speech = normalize_src_tgt(mix, speech, rng)
        if enroll is not None:
            enroll, _ = pad_or_cut(enroll, int(self.enroll_duration * fs),
                                   None, rng)
            enroll = enroll / (np.max(np.abs(enroll)) + 1e-5) * 0.99
        return enroll, mix, speech, interf, fs, length, speech_info.utt

    def __len__(self):
        return int(self.samples_per_epoch // (self.world_size * self.batch_size))

    def _producer(self, q: queue.Queue, done: threading.Event):
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for _ in range(len(self)):
                fs = 16000
                cut = (
                    self.rng.uniform(*self.cut_duration)
                    if isinstance(self.cut_duration, (list, tuple))
                    else self.cut_duration
                )
                mode = self.rng.choice(["se", "tse", "rtse"])
                results = list(pool.map(
                    self._one_sample,
                    [fs] * self.batch_size, [cut] * self.batch_size,
                    [mode] * self.batch_size,
                ))
                enrolls, mixes, speeches, interfs, fss, lens, names = zip(*results)
                batch = (
                    mode,
                    np.concatenate(enrolls, 0).astype(np.float32)
                    if mode != "se" else None,
                    np.concatenate(mixes, 0).astype(np.float32),
                    np.concatenate(speeches, 0).astype(np.float32),
                    np.concatenate(interfs, 0).astype(np.float32)
                    if mode != "se" else None,
                    np.asarray(fss, np.int64),
                    np.asarray(lens, np.int64),
                    list(names),
                )
                q.put(batch)
        done.set()

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch + 1)
        done = threading.Event()
        worker = threading.Thread(target=self._producer, args=(q, done),
                                  daemon=True)
        worker.start()
        while not done.is_set() or not q.empty():
            try:
                yield q.get(timeout=1.0)
            except queue.Empty:
                continue


class DevicePrefetcher:
    """Stage upcoming batches' arrays onto the accelerator from a background
    thread so host->device transfers overlap the current train step.

    On tunnel-attached chips a full-size UniSE batch is ~10 MB at
    ~80 MB/s — over 100 ms per step if transferred synchronously inside the
    step. The prefetcher calls ``jax.device_put`` on every ndarray leaf of
    the next ``depth`` batches while the device computes; non-array fields
    (mode strings, name lists) pass through untouched.

    The reference has no analogue (its DataLoader stops at host tensors;
    Lightning moves them at step time)."""

    def __init__(self, iterator, depth: int = 2, device=None):
        self.iterator = iterator
        self.depth = depth
        self.device = device

    def _stage(self, batch):
        import jax

        def put(x):
            if isinstance(x, np.ndarray):
                return (jax.device_put(x, self.device)
                        if self.device is not None else jax.device_put(x))
            return x

        return tuple(put(x) for x in batch) if isinstance(batch, tuple) \
            else put(batch)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = object()

        def producer():
            # Any error (iterator or device_put) must reach the consumer —
            # a dead producer with no sentinel would hang training forever
            # on q.get().
            try:
                for batch in self.iterator:
                    q.put(self._stage(batch))
                q.put(stop)
            except BaseException as e:  # noqa: BLE001 — re-raised in __iter__
                q.put(e)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = q.get()
            if item is stop:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
