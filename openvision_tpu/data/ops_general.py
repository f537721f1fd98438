"""General preprocessing ops (numpy).

Capability parity with reference src/transforms/ops_general.py.
"""

from __future__ import annotations

import numpy as np

from openvision_tpu.data.pp import inkey_outkey, pp_op


@pp_op("value_range")
@inkey_outkey(indefault="image", outdefault="image")
def get_value_range(vmin=-1.0, vmax=1.0, in_min=0.0, in_max=255.0, clip_values=False):
    def op(image, rng):
        image = np.asarray(image, np.float32)
        image = (image - in_min) / (in_max - in_min)
        image = vmin + image * (vmax - vmin)
        if clip_values:
            image = np.clip(image, vmin, vmax)
        return image

    return op


@pp_op("keep")
def get_keep(*keys):
    def op(data, rng):
        return {k: v for k, v in data.items() if k in keys}

    return op


@pp_op("drop")
def get_drop(*keys):
    def op(data, rng):
        return {k: v for k, v in data.items() if k not in keys}

    return op


@pp_op("copy")
def get_copy(inkey, outkey):
    def op(data, rng):
        data[outkey] = np.copy(data[inkey])
        return data

    return op


@pp_op("random_copy")
def get_random_copy(inkey1, inkey2, outkey, prob=0.5):
    def op(data, rng):
        src = inkey1 if rng.random() < prob else inkey2
        data[outkey] = np.copy(data[src])
        return data

    return op


@pp_op("onehot")
def get_onehot(depth, key="labels", key_result=None, multi=True, on=1.0, off=0.0):
    def op(data, rng):
        labels = np.asarray(data[key])
        out = np.full(labels.shape + (depth,) if not multi else (depth,), off, np.float32)
        if multi:
            out[np.reshape(labels, (-1,))] = on
        else:
            flat = np.reshape(labels, (-1,))
            out = np.full((flat.size, depth), off, np.float32)
            out[np.arange(flat.size), flat] = on
            out = out.reshape(labels.shape + (depth,))
        data[key_result or key] = out
        return data

    return op


@pp_op("squeeze_last_dim")
@inkey_outkey(indefault="image", outdefault="image")
def get_squeeze_last_dim():
    def op(x, rng):
        return np.squeeze(x, axis=-1)

    return op


@pp_op("concat")
def get_concat(inkeys, outkey, axis=-1):
    def op(data, rng):
        data[outkey] = np.concatenate([data[k] for k in inkeys], axis=axis)
        return data

    return op


@pp_op("pad_to_shape")
@inkey_outkey(indefault="labels", outdefault="labels")
def get_pad_to_shape(shape, pad_value=0):
    def op(x, rng):
        x = np.asarray(x)
        pads = []
        for want, have in zip(shape, x.shape):
            assert want is None or want >= have, (shape, x.shape)
            pads.append((0, 0 if want is None else want - have))
        return np.pad(x, pads, constant_values=pad_value)

    return op


@pp_op("lookup")
@inkey_outkey(indefault="labels", outdefault="labels")
def get_lookup(mapping, npzkey="fnames", sep=None):
    """Maps strings to integers via a mapping file (ref ops_general.py:65-100).

    `.npz` file: the `npzkey` array gives the strings, mapped to their index.
    Text file: one string per line → line number, or `key<sep>val` pairs.
    Unknown strings map to -1.
    """
    if str(mapping).endswith(".npz"):
        keys = np.load(mapping, allow_pickle=False)[npzkey]
        keys = [k.decode("utf-8") if isinstance(k, bytes) else str(k) for k in keys]
        vals = list(range(len(keys)))
    else:
        with open(mapping, "r") as f:
            lines = f.read().splitlines()
        if sep is None:
            keys, vals = lines, list(range(len(lines)))
        else:
            keys, vals = zip(*[ln.split(sep) for ln in lines])
            vals = [int(v) for v in vals]
    table = dict(zip(keys, vals))

    def one(needle):
        if isinstance(needle, (bytes, np.bytes_)):
            needle = needle.decode("utf-8")
        return table.get(str(needle), -1)

    def op(needle, rng):
        arr = np.asarray(needle)
        if arr.ndim == 0:
            return np.asarray(one(arr.item() if arr.dtype != object else arr[()]), np.int64)
        return np.asarray([one(x) for x in arr.reshape(-1)], np.int64).reshape(arr.shape)

    return op


@pp_op("rag_tensor")
@inkey_outkey(indefault="labels", outdefault="labels")
def get_rag_tensor():
    """Converts a tensor to a length-1 ragged batch (ref ops_general.py:214).

    tf's `RaggedTensor.from_tensor(x[None])` adds a leading batch dim so
    variable-length rows can be batched; the numpy/grain equivalent is a
    1-element list holding the row (the pipeline's batcher keeps lists
    ragged instead of stacking them).
    """

    def op(x, rng):
        return [np.asarray(x)]

    return op


@pp_op("flatten")
def get_flatten():
    """Flattens nested dicts: {"a": {"b": 1}} → {"a/b": 1}."""

    def op(data, rng):
        out = {}

        def rec(prefix, d):
            for k, v in d.items():
                key = f"{prefix}/{k}" if prefix else k
                if isinstance(v, dict):
                    rec(key, v)
                else:
                    out[key] = v

        rec("", data)
        return out

    return op
