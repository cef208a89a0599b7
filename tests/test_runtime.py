"""Native C++ record reader tests (built on demand with g++)."""

import numpy as np
import pytest

from k3m_tpu.data.records import RecordReader, write_records


def _records(n):
    for i in range(n):
        yield dict(item_id=str(i), title=f"t{i}",
                   features=np.full((2, 3), i, np.float32))


def test_native_reader_matches_python(tmp_path):
    from k3m_tpu.runtime import get_native_reader

    path = str(tmp_path / "x.k3mr")
    write_records(path, _records(25))
    native = get_native_reader(path)
    if native is None:
        pytest.skip("native toolchain unavailable")
    py = RecordReader(path)
    assert len(native) == len(py) == 25
    for i in (0, 7, 24):
        a, b = native[i], py[i]
        assert a["item_id"] == b["item_id"]
        np.testing.assert_array_equal(a["features"], b["features"])
    native.close()


def test_native_reader_rejects_garbage(tmp_path):
    from k3m_tpu.runtime import NativeRecordReader, _load

    if _load() is None:
        pytest.skip("native toolchain unavailable")
    bad = tmp_path / "bad.k3mr"
    bad.write_bytes(b"not a record file, definitely not at all......")
    with pytest.raises(ValueError):
        NativeRecordReader(str(bad))


def test_pipeline_uses_native(tmp_path):
    from k3m_tpu.data.pipeline import PretrainLoader
    from k3m_tpu.data.preprocess import ShapeSpec
    from k3m_tpu.runtime import NativeRecordReader, _load
    from k3m_tpu.tokenization import get_tokenizer

    path = str(tmp_path / "y.k3mr")
    write_records(path, (dict(item_id=str(i), title="上衣", pv="风格:古典;",
                              category="c", image_h=10, image_w=10,
                              num_boxes=0, boxes=None, features=None,
                              cls_prob=None) for i in range(8)))
    loader = PretrainLoader(
        path, get_tokenizer(),
        ShapeSpec(max_seq_len=12, max_seq_len_pv=16, max_num_pv=3,
                  max_region_len=4, v_feature_size=8, v_target_size=3),
        batch_size=4, shuffle=False, seed=0)
    if _load() is not None:
        assert isinstance(loader.reader, NativeRecordReader)
    b = next(iter(loader))
    assert b["input_ids"].shape == (4, 12)


def test_checkpoint_manager_save_restore_overwrite(tmp_path):
    """Full-state save / latest / restore / overwrite-on-resave (the
    reference's per-epoch torch.save semantics, train_concap_struc.py:691)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from k3m_tpu.train.state import CheckpointManager, TrainState

    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    tx = optax.sgd(0.1)
    state = TrainState(step=7, params=params, opt_state=tx.init(params))
    mgr = CheckpointManager(str(tmp_path))

    assert mgr.latest_epoch() is None
    assert mgr.restore(state) is None

    mgr.save(state, epoch=0)
    assert mgr.latest_epoch() == 0
    back = mgr.restore(state)
    np.testing.assert_array_equal(np.asarray(back.params["w"]),
                                  np.asarray(params["w"]))
    assert int(back.step) == 7

    # overwrite the SAME epoch (re-run) must not crash and must win
    state2 = TrainState(step=9, params={"w": params["w"] * 2},
                        opt_state=tx.init(params))
    mgr.save(state2, epoch=0)
    back2 = mgr.restore(state)
    assert int(back2.step) == 9
    np.testing.assert_array_equal(np.asarray(back2.params["w"]),
                                  np.asarray(params["w"]) * 2)

    mgr.save(state2, epoch=1)
    assert mgr.latest_epoch() == 1
