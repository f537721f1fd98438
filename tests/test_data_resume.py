"""Exact-batch data resume: the input pipeline checkpoints its position.

DeviceIterator snapshots the grain iterator state alongside each prefetched
batch, so `get_state()` is consistent with the last batch the TRAINER
consumed (not the producer thread's read-ahead). The trainer persists that
state next to each Orbax step and seeds the resumed pipeline with it —
beyond the reference, whose resume restores params only and re-reads data
from the start (main_clip.py:502-547).
"""

import numpy as np
import pytest

from openvision_tpu.data import pipeline as pipe
from openvision_tpu.parallel import create_mesh


def _input_cfg(batch_size=8):
    from openvision_tpu.configs import openvision as cfg_mod

    c = cfg_mod.get_config(
        "res=32,img=mu/16,txt_name=Ti,token_len=16,output_token_len=12,"
        'vocab_path="assets/bert_base_vocab_bos_eos.txt",runlocal=True'
    )
    c.input.batch_size = batch_size
    c.input.data = dict(name="synthetic", num_examples=64, res=48)
    return c.input


def _loader(batch_size=8):
    return pipe.training(_input_cfg(batch_size), seed=3)[0]


def _take(it, n):
    return [np.asarray(next(it)["image"]).copy() for _ in range(n)]


def test_device_iterator_state_resumes_exact_batch():
    mesh = create_mesh(data=8)
    it = pipe.start_input_pipeline(_loader(), mesh, prefetch=1)
    _take(it, 3)
    state = it.get_state()
    assert isinstance(state, bytes)
    ahead = _take(it, 2)

    it2 = pipe.start_input_pipeline(_loader(), mesh, prefetch=1, state=state)
    resumed = _take(it2, 2)
    for a, b in zip(ahead, resumed):
        np.testing.assert_array_equal(a, b)


def test_device_iterator_prefetch_does_not_skew_state():
    """With prefetch=2 the producer runs ahead; get_state must still describe
    the last YIELDED batch, not the last produced one."""
    mesh = create_mesh(data=8)
    it = pipe.start_input_pipeline(_loader(), mesh, prefetch=2)
    _take(it, 1)
    import time

    time.sleep(0.3)  # let the producer fill its read-ahead
    state = it.get_state()
    ahead = _take(it, 3)

    it2 = pipe.start_input_pipeline(_loader(), mesh, prefetch=2, state=state)
    resumed = _take(it2, 3)
    for a, b in zip(ahead, resumed):
        np.testing.assert_array_equal(a, b)


def test_device_iterator_propagates_producer_error():
    class Boom:
        def __iter__(self):
            raise RuntimeError("producer exploded")

    mesh = create_mesh(data=8)
    it = pipe.start_input_pipeline(Boom(), mesh, prefetch=1)
    with pytest.raises(RuntimeError, match="producer exploded"):
        next(it)


def test_mixture_degrades_gracefully():
    """The weighted mixture has no iterator state: get_state() is None and
    passing a state raises instead of silently restarting."""
    c = _input_cfg()
    mix, _ = pipe.training_mixture([c, c], [0.5, 0.5], seed=0)
    mesh = create_mesh(data=8)
    it = pipe.start_input_pipeline(mix, mesh, prefetch=0)
    next(it)
    assert it.get_state() is None
    it2 = pipe.start_input_pipeline(mix, mesh, prefetch=0, state=b"x")
    with pytest.raises(ValueError, match="not\\s+checkpointable"):
        next(it2)


def test_device_iterator_state_resumes_with_workers():
    """Exact-batch resume must survive grain worker PROCESSES: the state of
    a worker_count=2 iterator (which interleaves per-worker streams) must
    restore mid-stream to the same upcoming batches — workers are how
    production hosts run (round 5; composes with the tokenizer pickling
    fix in data/tokenizer.py)."""
    mesh = create_mesh(data=8)

    def loader():
        return pipe.training(_input_cfg(), seed=3, num_workers=2)[0]

    it = pipe.start_input_pipeline(loader(), mesh, prefetch=1)
    _take(it, 3)
    state = it.get_state()
    assert isinstance(state, bytes)
    ahead = _take(it, 2)

    it2 = pipe.start_input_pipeline(loader(), mesh, prefetch=1, state=state)
    resumed = _take(it2, 2)
    for a, b in zip(ahead, resumed):
        np.testing.assert_array_equal(a, b)
