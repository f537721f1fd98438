import numpy as np

from openvision_tpu.configs import openvision as cfg_mod
from openvision_tpu.data import pipeline as pipe
from openvision_tpu.parallel import create_mesh


def _cfg():
    c = cfg_mod.get_config(
        "res=32,img=mu/16,txt_name=Ti,token_len=16,output_token_len=12,"
        'vocab_path="assets/bert_base_vocab_bos_eos.txt",runlocal=True'
    )
    c.input.batch_size = 8
    c.input.data = dict(name="synthetic", num_examples=64, res=48)
    return c


def test_training_pipeline_yields_full_batches():
    c = _cfg()
    loader, n = pipe.training(c.input, seed=0)
    assert n == 64
    it = iter(loader)
    batch = next(it)
    assert batch["image"].shape == (8, 32, 32, 3)
    assert batch["labels1"].shape == (8, 16)
    assert batch["labels2"].shape == (8, 16)
    assert batch["autoreg_labels"].shape == (8, 12)
    assert batch["cap_loss_mask"].shape == (8, 12)
    assert set(batch.keys()) == {
        "image", "labels1", "labels2", "autoreg_labels", "cap_loss_mask",
    }
    # repeats past one epoch
    for _ in range(10):
        next(it)


def test_training_pipeline_to_device():
    c = _cfg()
    mesh = create_mesh(data=8)
    loader, _ = pipe.training(c.input, seed=0)
    it = pipe.start_input_pipeline(loader, mesh, prefetch=1)
    batch = next(it)
    assert batch["image"].shape == (8, 32, 32, 3)
    assert batch["image"].sharding.mesh.shape["data"] == 8


def test_inference_pipeline_pads_final_batch():
    src = pipe.DictSource(
        {"image": np.random.randint(0, 255, (10, 40, 40, 3), np.uint8)}
    )
    it_fn = pipe.make_for_inference(
        src, "|resize_small(32)|central_crop(32)|vgg_value_range", batch_size=4
    )
    batches = list(it_fn())
    assert len(batches) == 3
    assert all(b["image"].shape == (4, 32, 32, 3) for b in batches)
    masks = np.concatenate([b["_mask"] for b in batches])
    assert masks.sum() == 10
    assert list(masks[:10]) == [1.0] * 10


def test_training_pipeline_multiworker_matches_inprocess():
    """grain worker processes cloudpickle every transform — the native
    wordpiece tokenizer's ctypes handle used to break this ("ctypes objects
    containing pointers cannot be pickled", found by
    scripts/bench_pipeline.py round 5). The tokenizer now drops/re-probes
    its handle across pickling. Workers interleave BATCHES, so order is not
    comparable — but each record's content is deterministic (per-record pp
    RNG), so one epoch's rows must match as a multiset."""
    c = _cfg()

    def epoch_rows(workers):
        loader, n = pipe.training(c.input, seed=0, num_workers=workers)
        it = iter(loader)
        rows = []
        for _ in range(n // c.input.batch_size):
            batch = next(it)
            for i in range(c.input.batch_size):
                rows.append(hash(tuple(
                    batch[k][i].tobytes() for k in sorted(batch)
                )))
        return rows

    a, b = epoch_rows(0), epoch_rows(2)
    assert len(a) == len(b) == 64
    assert sorted(a) == sorted(b)
