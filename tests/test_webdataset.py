import io
import json
import tarfile

import numpy as np

from openvision_tpu.data import pipeline as pipe


def _make_shard(path, n, start=0):
    from PIL import Image

    with tarfile.open(path, "w") as tf:
        for i in range(start, start + n):
            img = Image.fromarray(
                np.random.RandomState(i).randint(0, 255, (24, 24, 3), "uint8")
            )
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            for ext, data in (
                ("jpg", buf.getvalue()),
                ("txt", f"caption number {i}".encode()),
                ("json", json.dumps({"llava_caption": f"long caption {i}."}).encode()),
            ):
                info = tarfile.TarInfo(f"{i:06d}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def test_webdataset_source_random_access(tmp_path):
    s1, s2 = str(tmp_path / "a.tar"), str(tmp_path / "b.tar")
    _make_shard(s1, 3, 0)
    _make_shard(s2, 2, 3)
    src = pipe.WebdatasetTarSource([s1, s2])
    assert len(src) == 5
    ex = src[4]
    assert ex["txt"] == "caption number 4"
    assert ex["llava_caption"] == "long caption 4."
    assert isinstance(ex["jpg"], bytes)
    # out-of-order access works (true random access)
    assert src[0]["txt"] == "caption number 0"
    assert src[3]["txt"] == "caption number 3"


def test_webdataset_through_training_pipeline(tmp_path):
    import ml_collections

    shard = str(tmp_path / "train.tar")
    _make_shard(shard, 8, 0)
    cfg = ml_collections.ConfigDict(
        dict(
            data=dict(name="webdataset", paths=[shard]),
            batch_size=4,
            pp=(
                'inception_crop(inkey="jpg", size=16, area_min=40)'
                "|my_bert_tokenize(max_len=12, output_token_len=8, "
                'vocab_path="assets/bert_base_vocab_bos_eos.txt", '
                'add_bos=True, add_eos=True, key1="txt", key2="llava_caption")'
                "|get_autoreg_label(pad_token=0)"
                '|keep("image", "labels1", "labels2", "autoreg_labels", "cap_loss_mask")'
            ),
        ),
        type_safe=False,
    )
    loader, n = pipe.training(cfg, seed=0)
    assert n == 8
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 16, 16, 3)
    assert batch["labels1"].shape == (4, 12)
