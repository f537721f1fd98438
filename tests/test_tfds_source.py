"""TfdsDirectorySource (TFRecord reader without the tfds package) and the
refactored disclf evaluator (pp-in-pipeline, per-process class splits,
multi-label counting). Reference: src/datasets/tfds.py:26-75 and
src/evaluators/proj/image_text/discriminative_classifier.py:128-153,300-336.
"""

import io
import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvision_tpu.data import pipeline as pipe
from openvision_tpu.models import clip as clip_mod
from openvision_tpu.parallel import create_mesh, unbox

VOCAB = "assets/bert_base_vocab_bos_eos.txt"


def _write_tfrecord(path, examples):
    """Writes tf.train.Example records in TFRecord framing (crc unchecked)."""
    from tensorflow.core.example import example_pb2

    with open(path, "wb") as f:
        for ex in examples:
            proto = example_pb2.Example()
            for k, v in ex.items():
                feat = proto.features.feature[k]
                if isinstance(v, bytes):
                    feat.bytes_list.value.append(v)
                elif isinstance(v, str):
                    feat.bytes_list.value.append(v.encode())
                elif isinstance(v, (list, tuple)):
                    feat.int64_list.value.extend(int(x) for x in v)
                elif isinstance(v, float):
                    feat.float_list.value.append(v)
                else:
                    feat.int64_list.value.append(int(v))
            payload = proto.SerializeToString()
            f.write(struct.pack("<Q", len(payload)))
            f.write(b"\x00" * 4)
            f.write(payload)
            f.write(b"\x00" * 4)


def _png_bytes(rng, h=24, w=24):
    from PIL import Image

    arr = rng.integers(0, 255, (h, w, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture()
def tfds_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "imagenet_like"
    d.mkdir()
    n = 7
    exs = [
        {"image": _png_bytes(rng), "label": i % 3, "file_name": f"img{i}.png"}
        for i in range(n)
    ]
    _write_tfrecord(
        d / "imagenet_like-validation.tfrecord-00000-of-00002", exs[:4]
    )
    _write_tfrecord(
        d / "imagenet_like-validation.tfrecord-00001-of-00002", exs[4:]
    )
    (d / "label.labels.txt").write_text("cat\ndog\nbird\n")
    return str(d), n


def test_tfds_directory_source_reads_records(tfds_dir):
    d, n = tfds_dir
    src = pipe.TfdsDirectorySource(d, "validation")
    assert len(src) == n
    ex = src[0]
    assert isinstance(ex["image"], bytes) and ex["image"][:4] == b"\x89PNG"
    assert ex["label"] == 0 and ex["file_name"] == b"img0.png"  # tfds-style bytes
    assert src[5]["label"] == 5 % 3
    assert src.label_names == ["cat", "dog", "bird"]


def test_tfds_source_missing_split_raises(tfds_dir):
    d, _ = tfds_dir
    with pytest.raises(FileNotFoundError):
        pipe.TfdsDirectorySource(d, "train")


def test_get_source_tfds_fallback(tfds_dir):
    d, n = tfds_dir
    src = pipe.get_source({"name": "tfds", "data_dir": d, "split": "validation"})
    assert len(src) == n


def test_tfds_source_through_eval_pipeline(tfds_dir):
    """decode + resize pp runs per-record in the pipeline; _mask pads."""
    d, n = tfds_dir
    src = pipe.TfdsDirectorySource(d, "validation")
    it = pipe.make_for_inference(
        src, 'decode|resize(16)|vgg_value_range(inkey="image")', 4
    )()
    batches = list(it)
    assert len(batches) == 2  # 7 examples -> 4 + 3(+1 pad)
    assert batches[0]["image"].shape == (4, 16, 16, 3)
    assert batches[1]["_mask"].sum() == 3
    assert batches[0]["label"].tolist() == [0, 1, 2, 0]


def _tiny():
    model = clip_mod.Model(
        out_dim=(32, 32),
        image=dict(variant="mu/16", posemb="sincos2d", pool_type="gap",
                   output_tokens=True, emb_head_bias=False),
        text=dict(variant="Ti", pool_type="last", vocab_size=30522,
                  output_tokens=True),
        text_decoder="none",
        temperature_init=1 / 0.07,
    )
    image = jnp.zeros((2, 32, 32, 3))
    text = jnp.zeros((2, 16), jnp.int32)
    params = unbox(model.init(jax.random.PRNGKey(0), image, text)["params"])
    return model, params


def _pp_txt():
    return (
        f'my_eval_bert_tokenize(inkey="texts", max_len=16, vocab_path="{VOCAB}", '
        "add_bos=True, add_eos=True)"
    )


def test_disclf_pp_runs_in_pipeline():
    """pp_img is applied by the eval pipeline (no host loop in run())."""
    from openvision_tpu.evaluators import disclf

    model, params = _tiny()
    mesh = create_mesh(data=8)
    images = np.random.randint(0, 255, (10, 32, 32, 3), np.uint8)
    labels = np.random.randint(0, 1000, (10,))
    src = pipe.DictSource({"image": images, "label": labels})
    ev = disclf.Evaluator(
        model, mesh,
        pp_img="|vgg_value_range", pp_txt=_pp_txt(),
        batch_size=8, prompt_templates="none", source=src,
    )
    metrics = dict(ev.run({"params": params}))
    assert 0.0 <= metrics["imagenet2012_accuracy"] <= 1.0


def test_disclf_multi_label_counting():
    """Real-labels mode: correct if argmax hits ANY label; -1 rows dropped."""
    from openvision_tpu.evaluators import disclf

    model, params = _tiny()
    mesh = create_mesh(data=8)
    images = np.random.randint(0, 255, (8, 32, 32, 3), np.uint8)
    src_single = pipe.DictSource({
        "image": images, "label": np.zeros((8,), np.int64),
    })
    ev = disclf.Evaluator(
        model, mesh, pp_img="|vgg_value_range", pp_txt=_pp_txt(),
        batch_size=8, prompt_templates="none", source=src_single,
    )
    # find the model's actual predictions by probing with all-labels rows
    all_hit = np.tile(np.arange(1000), (8, 1))
    src_multi = pipe.DictSource({
        "image": images, "label": np.zeros((8,), np.int64),
        "real_label": all_hit,
    })
    ev_m = disclf.Evaluator(
        model, mesh, pp_img="|vgg_value_range", pp_txt=_pp_txt(),
        batch_size=8, prompt_templates="none", source=src_multi,
        multi_label_key="real_label",
    )
    acc = dict(ev_m.run({"params": params}))["imagenet2012_accuracy"]
    assert acc == 1.0  # every prediction is in the label set

    # rows of -1 are excluded from the denominator entirely
    no_labels = np.full((8, 2), -1, np.int64)
    no_labels[:4] = all_hit[:4, :2]  # first 4 keep 2 valid labels
    src_half = pipe.DictSource({
        "image": images, "label": np.zeros((8,), np.int64),
        "real_label": no_labels,
    })
    ev_h = disclf.Evaluator(
        model, mesh, pp_img="|vgg_value_range", pp_txt=_pp_txt(),
        batch_size=8, prompt_templates="none", source=src_half,
        multi_label_key="real_label",
    )
    acc_h = dict(ev_h.run({"params": params}))["imagenet2012_accuracy"]
    assert 0.0 <= acc_h <= 1.0


def test_prepare_tree_roundtrip(tmp_path):
    """data/prepare.py converts a raw class tree into shards that
    TfdsDirectorySource serves with correct labels and class names."""
    from PIL import Image

    from openvision_tpu.data import prepare

    rng = np.random.default_rng(0)
    src = tmp_path / "val"
    for cname in ("n01440764", "n01443537", "n01484850"):
        (src / cname).mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 255, (20, 20, 3), np.uint8)
            Image.fromarray(arr).save(src / cname / f"img{i}.JPEG")

    out = tmp_path / "tfrec"
    n = prepare.prepare(str(src), str(out), split="validation", shards=2)
    assert n == 9

    srcds = pipe.TfdsDirectorySource(str(out), "validation")
    assert len(srcds) == 9
    assert srcds.label_names == ["n01440764", "n01443537", "n01484850"]
    labels = sorted(srcds[i]["label"] for i in range(9))
    assert labels == [0, 0, 0, 1, 1, 1, 2, 2, 2]
    assert srcds[0]["image"][:2] == b"\xff\xd8"  # JPEG magic

    # and through the eval pipeline with decode
    it = pipe.make_for_inference(
        srcds, 'decode|resize(16)|vgg_value_range(inkey="image")', 4
    )()
    batches = list(it)
    assert batches[0]["image"].shape == (4, 16, 16, 3)
    assert sum(b["_mask"].sum() for b in batches) == 9


def test_tfds_source_subsplit_syntax(tfds_dir):
    d, n = tfds_dir
    assert len(pipe.TfdsDirectorySource(d, "validation[:4]")) == 4
    assert len(pipe.TfdsDirectorySource(d, "validation[2:5]")) == 3
    src = pipe.TfdsDirectorySource(d, "validation[1:]")
    assert len(src) == n - 1
    assert src[0]["label"] == 1  # offset by the slice


def test_disclf_device_norm_matches_host_pp():
    """device_norm ships uint8 and normalizes on device; predictions must
    match the host-side pp normalize exactly (same affine map, f32)."""
    from openvision_tpu.evaluators import disclf

    model, params = _tiny()
    mesh = create_mesh(data=8)
    images = np.random.randint(0, 255, (10, 32, 32, 3), np.uint8)
    labels = np.random.randint(0, 1000, (10,))
    src = pipe.DictSource({"image": images, "label": labels})
    common = dict(pp_txt=_pp_txt(), batch_size=8,
                  prompt_templates="none", source=src)
    ev_host = disclf.Evaluator(
        model, mesh, pp_img="|value_range(-1,1)", **common)
    ev_dev = disclf.Evaluator(
        model, mesh, pp_img="", device_norm="value_range(-1,1)", **common)
    m_host, p_host, k_host = ev_host.run({"params": params}, return_preds=True)
    m_dev, p_dev, k_dev = ev_dev.run({"params": params}, return_preds=True)
    np.testing.assert_array_equal(p_host[k_host > 0], p_dev[k_dev > 0])
    assert dict(m_host) == dict(m_dev)


def test_disclf_custom_class_names():
    """class_names overrides the built-in set; logits span len(class_names)."""
    from openvision_tpu.evaluators import disclf

    model, params = _tiny()
    mesh = create_mesh(data=8)
    images = np.random.randint(0, 255, (8, 32, 32, 3), np.uint8)
    src = pipe.DictSource({
        "image": images, "label": np.random.randint(0, 5, (8,)),
    })
    ev = disclf.Evaluator(
        model, mesh, pp_img="|vgg_value_range", pp_txt=_pp_txt(),
        batch_size=8, prompt_templates="none", source=src,
        class_names=[f"class {i}" for i in range(5)],
    )
    _, preds, _ = ev.run({"params": params}, return_preds=True)
    assert preds.max() < 5
