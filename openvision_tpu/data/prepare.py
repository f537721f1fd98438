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


def _write_record(f, payload: bytes):
    # TFRecord framing; crc fields zeroed (readers that verify crc should
    # use tfds — TfdsDirectorySource skips them by design).
    f.write(struct.pack("<Q", len(payload)))
    f.write(b"\x00" * 4)
    f.write(payload)
    f.write(b"\x00" * 4)


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
        open(os.path.join(
            out, f"{name}-{split}.tfrecord-{i:05d}-of-{shards:05d}"), "wb")
        for i in range(shards)
    ]
    try:
        for i, (path, label) in enumerate(files):
            with open(path, "rb") as imgf:
                payload = _example(
                    imgf.read(), label, os.path.basename(path))
            _write_record(handles[i % shards], payload)
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
