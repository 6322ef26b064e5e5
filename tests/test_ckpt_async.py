"""AsyncWriter: background checkpoint saves match sync saves, serialize
per-path (FIFO), and surface worker errors instead of dropping them."""
import numpy as np
import pytest

from driving_dirty_tpu.checkpoints import io as ckpt_io


def _payload(i):
    return dict(
        params={"w": np.full((4, 3), float(i)), "b": np.arange(3.0) + i},
        state={"bn": {"mean": np.zeros(3) + i}},
        opt_state=[np.ones(2) * i, np.zeros(1)],
        hparams={"latent_dim": 8, "run": i},
        meta={"epoch": i, "global_step": 10 * i},
        extra={"rng": np.array([i, i + 1], np.uint32)},
    )


def test_async_save_equals_sync_save(tmp_path):
    sync_p = str(tmp_path / "sync.ckpt")
    async_p = str(tmp_path / "async.ckpt")
    ckpt_io.save(sync_p, **_payload(3))
    w = ckpt_io.AsyncWriter()
    w.save(async_p, **_payload(3))
    w.close()
    a, b = ckpt_io.load(sync_p), ckpt_io.load(async_p)
    np.testing.assert_array_equal(a["params"]["w"], b["params"]["w"])
    np.testing.assert_array_equal(a["extra"]["rng"], b["extra"]["rng"])
    assert a["hparams"] == b["hparams"]
    assert a["meta"] == b["meta"]
    np.testing.assert_array_equal(a["opt_state"][0], b["opt_state"][0])


def test_async_same_path_keeps_latest(tmp_path):
    path = str(tmp_path / "last.ckpt")
    w = ckpt_io.AsyncWriter()
    for i in range(5):
        w.save(path, **_payload(i))
    w.close()
    blob = ckpt_io.load(path)
    assert blob["meta"]["epoch"] == 4
    np.testing.assert_array_equal(blob["params"]["w"], np.full((4, 3), 4.0))


def test_async_error_surfaces_on_wait(tmp_path):
    w = ckpt_io.AsyncWriter()
    # a directory at the target path makes os.replace fail on the worker
    bad = tmp_path / "taken.ckpt"
    bad.mkdir()
    w.save(str(bad), **_payload(0))
    with pytest.raises(Exception):
        w.wait()
    # writer stays usable after the error is consumed
    ok = str(tmp_path / "ok.ckpt")
    w.save(ok, **_payload(1))
    w.close()
    assert ckpt_io.load(ok)["meta"]["epoch"] == 1


def test_eager_get_snapshots_before_return(tmp_path):
    """eager_get must deep-copy device data out before save() returns (the
    donation path); mutating the caller's arrays afterwards must not leak
    into the file. numpy arrays stand in for device buffers here — device_get
    on numpy returns copies only via np.asarray identity, so use jnp."""
    import jax.numpy as jnp

    path = str(tmp_path / "eager.ckpt")
    w = ckpt_io.AsyncWriter()
    params = {"w": jnp.ones((2, 2))}
    w.save(path, eager_get=True, params=params)
    del params  # donation analog: source buffers gone before the write lands
    w.close()
    np.testing.assert_array_equal(ckpt_io.load(path)["params"]["w"], np.ones((2, 2)))


def test_pending_saves_coalesce(tmp_path, monkeypatch):
    """A backlog of saves to one path collapses to the newest snapshot: the
    worker must not hold (and serially write) every intermediate generation —
    that pinned whole param+opt_state generations in HBM (io.py AsyncWriter
    docstring). Stale writes are skipped entirely."""
    import threading
    import time

    writes = []
    real_save = ckpt_io.save
    gate = threading.Event()

    def slow_save(path, **kw):
        gate.wait(5)  # hold the worker on the FIRST write until all enqueued
        writes.append(kw["meta"]["epoch"])
        return real_save(path, **kw)

    monkeypatch.setattr(ckpt_io, "save", slow_save)
    w = ckpt_io.AsyncWriter()
    path = str(tmp_path / "last.ckpt")
    w.save(path, **_payload(0))       # worker dequeues, blocks in slow_save
    time.sleep(0.2)                   # let the worker pick up epoch-0
    for i in (1, 2, 3):
        w.save(path, **_payload(i))   # 1 and 2 must coalesce away under 3
    gate.set()
    w.close()
    assert writes == [0, 3], writes   # intermediates never written
    assert ckpt_io.load(path)["meta"]["epoch"] == 3
