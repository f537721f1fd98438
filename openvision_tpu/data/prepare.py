"""Dataset preparation CLI: raw image trees → TFDS-format TFRecord shards.

Closes the real-data loop (reference consumed ready-made TFDS/DataComp
directories via src/datasets/tfds.py): this converts a raw
`<root>/<class_dir>/<img>` tree (the standard ImageNet val layout) into
sharded TFRecord files + `label.labels.txt` that `TfdsDirectorySource`
serves directly — no tensorflow_datasets needed on either side — and that
the disclf evaluator consumes via `data_dir=<out>`.

Records carry {image: encoded bytes (skip-decode, like tfds.py:44),
label: int64 (sorted-class-dir order — the ImageNet wnid convention),
file_name: bytes}.

Usage:
  python -m openvision_tpu.data.prepare --src /data/imagenet/val \
      --out /data/in1k_val_tfrecord --split validation [--shards 64]
"""

from __future__ import annotations

import argparse
import os
import struct


IMG_EXTS = (".jpeg", ".jpg", ".png", ".webp", ".bmp")


def _crc32c_table() -> list[int]:
    poly = 0x82F63B78  # Castagnoli, reflected
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_CRC32C_TABLE = _crc32c_table()


def _masked_crc32c(data: bytes) -> int:
    """TFRecord's masked crc32c (the framing checksum standard readers
    verify): rotate-right-15 of crc32c plus the mask constant."""
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    crc ^= 0xFFFFFFFF
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _write_record(f, payload: bytes):
    # TFRecord framing with real masked-crc32c fields so standard
    # CRC-verifying readers (tf.data, tfds) accept these shards too;
    # TfdsDirectorySource skips verification either way.
    length = struct.pack("<Q", len(payload))
    f.write(length)
    f.write(struct.pack("<I", _masked_crc32c(length)))
    f.write(payload)
    f.write(struct.pack("<I", _masked_crc32c(payload)))


class _Writer:
    """One TFRecord shard writer: TF's C++ TFRecordWriter when available
    (fast CRC), else the Python framing above."""

    def __init__(self, path: str):
        try:
            import tensorflow as tf

            self._w = tf.io.TFRecordWriter(path)
            self._f = None
        except ImportError:
            self._w = None
            self._f = open(path, "wb")

    def write(self, payload: bytes):
        if self._w is not None:
            self._w.write(payload)
        else:
            _write_record(self._f, payload)

    def close(self):
        (self._w or self._f).close()


def _example(image_bytes: bytes, label: int, fname: str) -> bytes:
    from tensorflow.core.example import example_pb2

    ex = example_pb2.Example()
    ex.features.feature["image"].bytes_list.value.append(image_bytes)
    ex.features.feature["label"].int64_list.value.append(label)
    ex.features.feature["file_name"].bytes_list.value.append(fname.encode())
    return ex.SerializeToString()


def prepare(src: str, out: str, split: str = "validation",
            shards: int = 64, name: str = "dataset") -> int:
    """Converts the tree; returns the number of records written."""
    classes = sorted(
        d for d in os.listdir(src) if os.path.isdir(os.path.join(src, d))
    )
    if not classes:
        raise SystemExit(f"no class directories under {src}")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "label.labels.txt"), "w") as f:
        f.write("\n".join(classes) + "\n")

    files: list[tuple[str, int]] = []
    for li, cdir in enumerate(classes):
        cpath = os.path.join(src, cdir)
        for fn in sorted(os.listdir(cpath)):
            if fn.lower().endswith(IMG_EXTS):
                files.append((os.path.join(cpath, fn), li))
    shards = max(1, min(shards, len(files)))

    handles = [
        _Writer(os.path.join(
            out, f"{name}-{split}.tfrecord-{i:05d}-of-{shards:05d}"))
        for i in range(shards)
    ]
    try:
        for i, (path, label) in enumerate(files):
            with open(path, "rb") as imgf:
                payload = _example(
                    imgf.read(), label, os.path.basename(path))
            handles[i % shards].write(payload)
    finally:
        for h in handles:
            h.close()
    return len(files)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--src", required=True,
                        help="root of <class_dir>/<image> tree")
    parser.add_argument("--out", required=True)
    parser.add_argument("--split", default="validation")
    parser.add_argument("--shards", type=int, default=64)
    parser.add_argument("--name", default="dataset")
    args = parser.parse_args(argv)
    n = prepare(args.src, args.out, args.split, args.shards, args.name)
    print(f"wrote {n} records to {args.out} "
          f"({args.shards} shards, split {args.split!r})")


if __name__ == "__main__":
    main()
