"""Input pipeline on grain (JAX's native data loader) + device placement.

Capability parity with reference src/datasets/input_pipeline.py and
src/datasets/core.py/tfds.py, redesigned TPU-first:

- grain.DataLoader with per-process sharding (ShardByJaxProcess) replaces the
  per-host tfds.even_splits + tf.data stack; worker processes replace the
  tf.data thread pool.
- preprocessing is the registry pp-string DSL over numpy dicts
  (openvision_tpu/data/pp.py) with per-record deterministic RNG.
- eval uses the reference's infinite-padding trick (input_pipeline.py:170-182):
  the final short batch is zero-padded and a `_mask` key marks real examples.
- host batches become global arrays with `local_batch_to_global` (one
  device_put per batch; multi-host assembles via process-local data).

Sources: synthetic (tests/benchmarks), in-memory dict-of-arrays, JSONL
(image path/bytes + captions), and ArrayRecord files (grain-native). TFDS is
gated behind availability (not installed in this image).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Iterator, Sequence

import jax
import numpy as np

import grain.python as grain

from openvision_tpu.data.pp import build_pp_fn, import_pp_modules
from openvision_tpu.parallel import local_batch_to_global


# ---------------------------------------------------------------------------
# Sources
# ---------------------------------------------------------------------------


class SyntheticClipSource(grain.RandomAccessDataSource):
    """Deterministic random images + captions (smoke tests, benchmarks)."""

    _CAPTIONS = (
        "a photo of a cat sitting on a mat",
        "an aerial view of a city at night. bright lights everywhere!",
        "two dogs playing in the snow",
        "a close-up of a red flower. petals glisten with dew!",
    )

    def __init__(self, num_examples: int = 1024, height: int = 64, width: int = 64):
        self._n = num_examples
        self._h, self._w = height, width

    def __repr__(self):
        # stable across processes: grain validates repr(source) when
        # restoring iterator state (exact-batch data resume).
        return f"SyntheticClipSource(n={self._n}, h={self._h}, w={self._w})"

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int):
        rng = np.random.default_rng(i)
        img = rng.integers(0, 255, (self._h, self._w, 3), np.uint8)
        cap = self._CAPTIONS[i % len(self._CAPTIONS)]
        # "jpg" matches the webdataset feature name the reference pp strings
        # address (configs/openvision.py:128).
        return {"jpg": img, "txt": cap, "llava_caption": cap}


class DictSource(grain.RandomAccessDataSource):
    """In-memory dict-of-arrays source (eval sets, unit tests)."""

    def __init__(self, data: dict[str, Any]):
        self._data = data
        lens = {len(v) for v in data.values()}
        assert len(lens) == 1, f"ragged source: {lens}"
        self._n = lens.pop()

    def __repr__(self):
        return f"DictSource(keys={sorted(self._data)}, n={self._n})"

    def __len__(self):
        return self._n

    def __getitem__(self, i: int):
        return {k: v[i] for k, v in self._data.items()}


class JsonlImageSource(grain.RandomAccessDataSource):
    """JSONL with {"image": <path>, "txt": ..., ...}; images loaded lazily."""

    def __init__(self, jsonl_path: str, image_root: str = "", image_key: str = "image"):
        with open(jsonl_path) as f:
            self._rows = [json.loads(l) for l in f if l.strip()]
        self._path = jsonl_path
        self._root = image_root
        self._key = image_key

    def __repr__(self):
        return (f"JsonlImageSource({self._path!r}, root={self._root!r}, "
                f"key={self._key!r})")

    def __len__(self):
        return len(self._rows)

    def __getitem__(self, i: int):
        row = dict(self._rows[i])
        path = os.path.join(self._root, row[self._key])
        with open(path, "rb") as f:
            row[self._key] = f.read()
        return row


def get_source(data_cfg) -> grain.RandomAccessDataSource:
    """Builds a source from config.input.data (name-dispatched)."""
    name = data_cfg.get("name", "synthetic")
    if name == "synthetic":
        return SyntheticClipSource(
            num_examples=data_cfg.get("num_examples", 1024),
            height=data_cfg.get("res", 64),
            width=data_cfg.get("res", 64),
        )
    if name == "jsonl":
        return JsonlImageSource(
            data_cfg["path"], data_cfg.get("image_root", ""),
            data_cfg.get("image_key", "image"),
        )
    if name == "arrayrecord":
        return grain.ArrayRecordDataSource(data_cfg["paths"])
    if name == "webdataset":
        import glob as _glob

        paths = data_cfg.get("paths") or sorted(_glob.glob(data_cfg["pattern"]))
        return WebdatasetTarSource(paths)
    if name == "tfds":
        # Directories without tfds metadata (e.g. data/prepare.py output) are
        # unreadable by builder_from_directory even when the package IS
        # installed, so gate on dataset_info.json rather than catching only
        # ImportError.
        has_meta = os.path.exists(
            os.path.join(data_cfg["data_dir"], "dataset_info.json")
        )
        if has_meta:
            try:
                import tensorflow_datasets as tfds

                builder = tfds.builder_from_directory(data_cfg["data_dir"])
                return builder.as_data_source(split=data_cfg["split"])
            except ImportError:
                pass
        # metadata absent or package absent: serve the directory from
        # first principles
        return TfdsDirectorySource(
            data_cfg["data_dir"], data_cfg.get("split", "train")
        )
    raise ValueError(f"Unknown data source: {name!r}")


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PpTransform(grain.RandomMapTransform):
    """Applies a composed pp fn with grain's per-record deterministic RNG."""

    pp_fn: Callable

    def random_map(self, data, rng: np.random.Generator):
        return self.pp_fn(dict(data), rng)


@dataclasses.dataclass
class MixupCutmixTransform(grain.RandomMapTransform):
    """Batch-level mixup/cutmix AFTER grain.Batch (the reference's cpu_mixup
    path: MixupAndCutmix from mixup.py:29 applied on host batches)."""

    image_key: str = "image"
    label_key: str = "labels"
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    switch_prob: float = 0.5
    num_classes: int | None = None

    def random_map(self, batch, rng: np.random.Generator):
        from openvision_tpu.data.ops_aug import mixup_cutmix

        batch = dict(batch)
        images, labels = mixup_cutmix(
            batch[self.image_key], batch[self.label_key], rng,
            mixup_alpha=self.mixup_alpha, cutmix_alpha=self.cutmix_alpha,
            switch_prob=self.switch_prob, num_classes=self.num_classes,
        )
        batch[self.image_key] = images
        batch[self.label_key] = labels
        return batch


# ---------------------------------------------------------------------------
# Train pipeline
# ---------------------------------------------------------------------------


def training(input_cfg, *, seed: int = 0, num_workers: int = 0):
    """Builds (grain iterator factory, num_examples) for training.

    Local batch = global batch // process_count; sharding + shuffle + repeat
    are grain-native. Returns (loader, total_examples).
    """
    import_pp_modules()
    source = get_source(input_cfg.data)
    pp_fn = build_pp_fn(input_cfg.pp)

    global_bs = input_cfg.batch_size
    assert global_bs % jax.process_count() == 0
    local_bs = global_bs // jax.process_count()

    sampler = grain.IndexSampler(
        num_records=len(source),
        shard_options=grain.ShardByJaxProcess(drop_remainder=True),
        shuffle=True,
        num_epochs=None,  # repeat forever
        seed=seed,
    )
    operations = [
        PpTransform(pp_fn),
        grain.Batch(batch_size=local_bs, drop_remainder=True),
    ]
    mixup_cfg = dict(input_cfg.get("mixup") or {})
    if mixup_cfg.pop("enabled", False):
        operations.append(MixupCutmixTransform(**mixup_cfg))
    loader = grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=operations,
        worker_count=num_workers,
    )
    return loader, len(source)


def training_mixture(
    input_cfgs: Sequence, weights: Sequence[float], *, seed: int = 0,
    num_workers: int = 0,
):
    """Weighted mixture of several training pipelines.

    Capability parity with reference input_pipeline.py:100-133 (multi-dataset
    weighted mixing): each component is a full `training()` pipeline; batches
    are drawn from component i with probability weights[i] (deterministic
    given `seed`). Returns (iterator factory, total_examples).
    """
    loaders, sizes = zip(*(training(c, seed=seed + i, num_workers=num_workers)
                           for i, c in enumerate(input_cfgs)))
    probs = np.asarray(weights, np.float64)
    probs = probs / probs.sum()

    class _Mixture:
        def __iter__(self):
            its = [iter(l) for l in loaders]
            rng = np.random.default_rng(seed)
            while True:
                yield next(its[rng.choice(len(its), p=probs)])

    return _Mixture(), int(sum(sizes))


def make_for_inference(
    source: grain.RandomAccessDataSource,
    pp_string: str,
    batch_size: int,
    *,
    seed: int = 0,
    num_workers: int = 0,
    shard: bool = True,
):
    """Eval pipeline: one epoch, final batch zero-padded with a `_mask` key.

    The infinite-padding trick from the reference (input_pipeline.py:141-182):
    downstream metric code sums `_mask` to count real examples, so multihost
    evals never hang on ragged final batches. With `num_workers > 0` the pp
    runs in grain worker processes (the reference pipelines eval pp through
    parallel tf.data threads, input_pipeline.py:141-189) — evaluators should
    pass their pp string here rather than mapping per example on the host.

    `shard=False` makes every process iterate the FULL source in lockstep
    (identical local batches on all hosts) instead of a per-process shard.
    Small evals that slice their own rows back out of a replicated global
    batch (e.g. retrieval) need this: with sharding, rows [0:local_bs] of the
    global batch are process 0's shard, not this host's records.
    """
    import_pp_modules()
    pp_fn = build_pp_fn(pp_string) if pp_string else (lambda d, r: d)

    local_bs = batch_size // jax.process_count()
    # Every process yields EXACTLY this many batches — computable from global
    # quantities only — so multihost eval loops stay in lockstep even when
    # grain's per-process shard sizes straddle a batch boundary (the point of
    # the reference's infinite-padding trick, input_pipeline.py:141-182).
    # ceil(local_n / local_bs) <= ceil(ceil(n/P) / local_bs) = n_steps always.
    n_steps = -(-len(source) // (batch_size if shard else local_bs))

    def iterate() -> Iterator[dict]:
        sampler = grain.IndexSampler(
            num_records=len(source),
            shard_options=(
                grain.ShardByJaxProcess(drop_remainder=False) if shard
                else grain.ShardOptions(shard_index=0, shard_count=1)
            ),
            shuffle=False,
            num_epochs=1,
            seed=seed,
        )
        loader = grain.DataLoader(
            data_source=source,
            sampler=sampler,
            operations=[PpTransform(pp_fn)],
            worker_count=num_workers,
        )
        buf: list[dict] = []
        yielded = 0
        pad = None
        for ex in loader:
            ex["_mask"] = np.ones((), np.float32)
            buf.append(ex)
            if len(buf) == local_bs:
                yield _stack(buf)
                yielded += 1
                pad = pad or {k: np.zeros_like(v) for k, v in buf[-1].items()}
                buf = []
        if buf:
            pad = {k: np.zeros_like(v) for k, v in buf[-1].items()}
        if pad is None and yielded < n_steps:
            # empty local shard (source smaller than process count): derive
            # the batch structure from record 0 so padding batches still flow.
            ex = pp_fn(dict(source[0]), np.random.default_rng(0))
            ex["_mask"] = np.ones((), np.float32)
            pad = {k: np.zeros_like(np.asarray(v)) for k, v in ex.items()}
        while yielded < n_steps:
            while len(buf) < local_bs:
                buf.append(dict(pad))
            yield _stack(buf)
            yielded += 1
            buf = []

    return iterate


def _stack(examples: Sequence[dict]) -> dict:
    keys = examples[0].keys()
    return {k: np.stack([np.asarray(e[k]) for e in examples]) for k in keys}


class DeviceIterator:
    """Host iterator → global sharded device batches, with host-side prefetch
    and exact-position checkpointing.

    Each prefetched batch travels through the queue together with the grain
    iterator's state snapshot taken right after producing it, so
    `get_state()` always describes the position AFTER the last batch this
    object yielded to the caller — checkpoint-consistent even while the
    producer thread runs `prefetch` batches ahead. Pass the saved bytes back
    as `state=` to resume mid-epoch on the exact next batch. Beyond the
    reference, whose resume restores params only and re-reads data from the
    start (main_clip.py:502-547); grain's iterator state is per-process, so
    each host checkpoints its own shard position.

    Loaders whose iterators lack get_state/set_state (e.g. the weighted
    mixture) still work: get_state() then returns None and resume falls back
    to fresh data.

    Producer-thread exceptions propagate to the consumer (the previous
    generator implementation silently ended iteration on a worker error,
    which a training loop would misread as end-of-data).
    """

    def __init__(self, loader, mesh, *, prefetch: int = 1, state=None,
                 on_first_batch=None):
        self._loader = loader
        self._mesh = mesh
        self._prefetch = prefetch
        self._init_state = state
        self._last_state = state
        self._on_first_batch = on_first_batch
        self._host_it = None
        self._queue = None
        self._sync_iter = None
        self._stateful = False

    _STOP = object()

    def _ensure_started(self):
        if self._host_it is not None:
            return
        import queue
        import threading

        it = iter(self._loader)
        self._stateful = hasattr(it, "get_state") and hasattr(it, "set_state")
        if self._init_state is not None:
            if not self._stateful:
                raise ValueError(
                    "data-state resume requested but the loader's iterator "
                    "has no set_state (weighted mixtures are not "
                    "checkpointable)"
                )
            it.set_state(self._init_state)
        self._host_it = it

        if self._prefetch <= 0:
            return

        q: queue.Queue = queue.Queue(maxsize=self._prefetch)
        self._queue = q

        def producer():
            try:
                for item in self._produce():
                    q.put(item)
                q.put((self._STOP, None))
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                q.put((e, None))

        threading.Thread(target=producer, daemon=True).start()

    def _produce(self):
        first = True
        for batch in self._host_it:
            if first:
                if self._on_first_batch is not None:
                    self._on_first_batch(batch)
                first = False
            state = self._host_it.get_state() if self._stateful else None
            yield local_batch_to_global(batch, self._mesh), state

    def __iter__(self):
        return self

    def __next__(self):
        self._ensure_started()
        if self._queue is None:  # prefetch <= 0: synchronous
            if self._sync_iter is None:
                self._sync_iter = self._produce()
            batch, state = next(self._sync_iter)
            self._last_state = state
            return batch
        item, state = self._queue.get()
        if item is self._STOP:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        self._last_state = state
        return item

    def get_state(self):
        """Iterator state (bytes) after the last yielded batch, or None."""
        return self._last_state


def start_input_pipeline(loader, mesh, *, prefetch: int = 1, state=None,
                         on_first_batch=None) -> "DeviceIterator":
    """Host iterator → global sharded device batches (see DeviceIterator)."""
    return DeviceIterator(loader, mesh, prefetch=prefetch, state=state,
                          on_first_batch=on_first_batch)


def _shard_fd(cache: dict[int, int], shards: Sequence[str], shard: int) -> int:
    """Per-process fd for a shard, for use with os.pread.

    Positioned reads (pread) are atomic, so a single fd is safe under
    grain's intra-worker prefetch threads — unlike a shared file object,
    whose seek+read pair races (observed as protobuf DecodeError at 10k
    records). A dict race at open worst-case opens a duplicate fd, which
    the loser closes.
    """
    fd = cache.get(shard)
    if fd is None:
        fd = os.open(shards[shard], os.O_RDONLY)
        prior = cache.setdefault(shard, fd)
        if prior != fd:
            os.close(fd)
            fd = prior
    return fd


class WebdatasetTarSource(grain.RandomAccessDataSource):
    """Random-access reader over webdataset-style tar shards.

    The reference trains from DataComp webdataset shards (via a TFDS builder,
    tfds.py:39); this reads the tars directly: on open, each shard is scanned
    once to index member offsets, grouping files by key prefix
    (`<key>.jpg`, `<key>.txt`, `<key>.json`, ...). Records are then served by
    seeking — grain gets true random access without TFDS.
    """

    def __init__(self, paths: Sequence[str], text_keys=("txt", "json")):
        self._shards: list[str] = list(paths)
        self._text_keys = text_keys
        self._index: list[tuple[int, dict[str, tuple[int, int]]]] = []
        for si, path in enumerate(self._shards):
            groups: dict[str, dict[str, tuple[int, int]]] = {}
            for name, offset, size in self._scan(path):
                base = os.path.basename(name)
                key, _, ext = base.rpartition(".")
                groups.setdefault(key, {})[ext.lower()] = (offset, size)
            for key in sorted(groups):
                self._index.append((si, groups[key]))
        self._fds: dict[int, int] = {}

    def __repr__(self):
        return (f"WebdatasetTarSource(shards={self._shards!r}, "
                f"text_keys={tuple(self._text_keys)!r})")

    @staticmethod
    def _scan(path):
        """Member (name, offset, size) triples — native C++ indexer when
        built (openvision_tpu/native/indexer.cpp), else Python tarfile."""
        from openvision_tpu.native.indexer import tar_index

        entries = tar_index(path)
        if entries is not None:
            return entries
        import tarfile

        out = []
        with tarfile.open(path) as tf:
            for m in tf:
                if m.isfile():
                    out.append((m.name, m.offset_data, m.size))
        return out

    def __len__(self):
        return len(self._index)

    def _fd(self, shard: int) -> int:
        # One fd per shard per process; reads go through os.pread, which is
        # an atomic positioned read — grain's intra-worker prefetch THREADS
        # share this source, and a seek+read pair would race (observed as
        # corrupt records at 10k scale, docs/PERF_NOTES.md).
        return _shard_fd(self._fds, self._shards, shard)

    def __getstate__(self):
        return {**self.__dict__, "_fds": {}}

    def __getitem__(self, i: int):
        shard, members = self._index[i]
        fd = self._fd(shard)
        out: dict[str, Any] = {}
        for ext, (offset, size) in members.items():
            raw = os.pread(fd, size, offset)
            if ext in ("jpg", "jpeg", "png", "webp"):
                out["jpg"] = raw
            elif ext == "txt":
                out["txt"] = raw.decode("utf-8")
            elif ext == "json":
                meta = json.loads(raw)
                for k, v in meta.items():
                    out.setdefault(k, v)
        out.setdefault("txt", "")
        out.setdefault("llava_caption", out["txt"])
        return out


class TfdsDirectorySource(grain.RandomAccessDataSource):
    """Random access over a TFDS-format dataset directory WITHOUT the
    tensorflow_datasets package.

    The reference reads DataComp/ImageNet shards via
    `tfds.builder_from_directory` (src/datasets/tfds.py:39); this serves the
    same directories from first principles: TFRecord shard files are scanned
    once to index record offsets (framing: u64 length + u32 crc + payload +
    u32 crc), and records are parsed as tf.train.Example protos with every
    feature decoded generically (bytes/int64/float; singletons unwrapped).
    Image features stay ENCODED (the reference's skip-decode, tfds.py:44) —
    the pp `decode` op handles decoding in workers.
    """

    def __init__(self, data_dir: str, split: str = "train"):
        import glob as _glob
        import re
        import struct

        # tfds sub-split syntax "validation[:4]" / "train[10:20]" (the
        # runlocal configs emit these, reference openvision.py:312)
        sub = None
        m = re.fullmatch(r"(.+?)\[(-?\d*):(-?\d*)\]", split)
        if m:
            split = m.group(1)
            sub = slice(
                int(m.group(2)) if m.group(2) else None,
                int(m.group(3)) if m.group(3) else None,
            )

        pats = [
            os.path.join(data_dir, f"*-{split}.tfrecord-*"),
            os.path.join(data_dir, f"*.{split}.tfrecord-*"),
            os.path.join(data_dir, f"{split}.tfrecord-*"),
        ]
        self._shards: list[str] = []
        for p in pats:
            self._shards = sorted(_glob.glob(p))
            if self._shards:
                break
        if not self._shards:
            raise FileNotFoundError(
                f"no TFRecord shards for split {split!r} in {data_dir}"
            )
        # (shard_idx, offset, payload_size) per record; native C++ scan
        # when built, else the Python walk
        from openvision_tpu.native.indexer import tfrecord_index

        self._index: list[tuple[int, int, int]] = []
        for si, path in enumerate(self._shards):
            native = tfrecord_index(path)
            if native is not None:
                self._index.extend((si, off, sz) for off, sz in native)
                continue
            with open(path, "rb") as f:
                while True:
                    head = f.read(8)
                    if len(head) < 8:
                        break
                    (length,) = struct.unpack("<Q", head)
                    f.seek(4, 1)  # length crc
                    self._index.append((si, f.tell(), length))
                    f.seek(length + 4, 1)  # payload + payload crc
        if sub is not None:
            self._index = self._index[sub]
        self._fds: dict[int, int] = {}
        self._label_names = _tfds_label_names(data_dir)
        self._repr = (
            f"TfdsDirectorySource({data_dir!r}, split={split!r}, "
            f"sub={sub!r}, n={len(self._index)})"
        )

    def __repr__(self):
        return self._repr

    def __len__(self):
        return len(self._index)

    @property
    def label_names(self):
        return self._label_names

    def __getstate__(self):
        return {**self.__dict__, "_fds": {}}

    def __getitem__(self, i: int):
        from tensorflow.core.example import example_pb2

        shard, offset, size = self._index[i]
        fd = _shard_fd(self._fds, self._shards, shard)
        ex = example_pb2.Example.FromString(os.pread(fd, size, offset))
        out: dict[str, Any] = {}
        for name, feat in ex.features.feature.items():
            kind = feat.WhichOneof("kind")
            if kind == "bytes_list":
                vals = list(feat.bytes_list.value)
            elif kind == "int64_list":
                vals = [int(v) for v in feat.int64_list.value]
            elif kind == "float_list":
                vals = [float(v) for v in feat.float_list.value]
            else:
                continue
            out[name] = vals[0] if len(vals) == 1 else vals
        return out


def _tfds_label_names(data_dir: str):
    """Reads class names from TFDS metadata files when present."""
    for fname in ("label.labels.txt", "labels.labels.txt"):
        path = os.path.join(data_dir, fname)
        if os.path.exists(path):
            with open(path) as f:
                return [l.rstrip("\n") for l in f]
    return None
