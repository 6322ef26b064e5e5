"""Checkpoint save/restore: pytree of arrays + embedded hparams.

Format: a single `.ckpt` file = np.savez archive holding every leaf under a
flattened "section/path/to/leaf" key plus a JSON metadata entry (hparams,
epoch, step, task name). Properties preserved from the reference's Lightning
checkpoints (SURVEY.md §5.4):

  * self-reconstruction: hparams are embedded, so `load(path)` alone is enough
    for a downstream task to rebuild the producing model
    (`BasicAE.load_from_checkpoint`, /root/reference/src/roadmap_model/roadmap_bce_v2.py:43);
  * atomic writes (tmp + rename) for preemption safety (submit.py:65's
    checkpoint-before-walltime behavior relies on ckpt integrity);
  * keep-best (monitor val_loss) and keep-last files side by side.

A separate module (torch_import.py) maps reference PyTorch `rm.ckpt` weights
into this layout for output-parity runs.
"""
from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import jax

_SEP = "/"
_META_KEY = "__meta__"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}{_SEP}"))
    elif tree is None:
        pass
    else:
        out[prefix[: -len(_SEP)]] = np.asarray(tree)
    return out


def _unflatten(flat):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split(_SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return _listify(root)


def _listify(node):
    """Convert dicts whose keys are 0..n-1 strings back into lists."""
    if not isinstance(node, dict):
        return node
    node = {k: _listify(v) for k, v in node.items()}
    keys = list(node)
    if keys and all(k.isdigit() for k in keys):
        idx = sorted(int(k) for k in keys)
        if idx == list(range(len(idx))):
            return [node[str(i)] for i in idx]
    return node


def save(path, *, params, state=None, opt_state=None, hparams=None, meta=None, extra=None):
    """Atomically write a checkpoint. hparams: JSON-serializable dict/Namespace.

    `opt_state` is stored structure-free as its ordered leaf list (optax
    states are namedtuple pytrees whose structure the restoring optimizer
    already knows — see `restore_opt_state`). `extra` is a small dict pytree
    of arrays for trainer-owned state (rng key, etc.).
    """
    params = jax.device_get(params)
    payload = {"params": params}
    if state is not None:
        payload["state"] = jax.device_get(state)
    if opt_state is not None:
        payload["opt_state"] = [np.asarray(l) for l in jax.device_get(jax.tree.leaves(opt_state))]
    if extra is not None:
        payload["extra"] = jax.device_get(extra)
    flat = _flatten(payload)
    if hparams is not None and not isinstance(hparams, dict):
        hparams = dict(vars(hparams))
    meta_blob = json.dumps(
        {"hparams": _jsonable(hparams), "meta": _jsonable(meta or {})}
    )
    flat[_META_KEY] = np.frombuffer(meta_blob.encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


def _jsonable(obj):
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.generic):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return str(obj)


def load(path):
    """-> dict with 'params', optional 'state'/'opt_state', 'hparams', 'meta'."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files if k != _META_KEY}
        meta = json.loads(bytes(z[_META_KEY].tobytes()).decode()) if _META_KEY in z.files else {}
    tree = _unflatten(flat)
    out = {
        "params": tree.get("params", {}),
        "state": tree.get("state"),
        "opt_state": tree.get("opt_state"),
        "extra": tree.get("extra"),
        "hparams": meta.get("hparams"),
        "meta": meta.get("meta", {}),
    }
    return out


class AsyncWriter:
    """Background checkpoint writer: keeps periodic checkpointing off the
    step loop.

    jax arrays are immutable, so capturing the pytree by reference is a
    consistent snapshot — the training step produces NEW param buffers each
    step. The device_get + npz write then run in a worker thread, overlapping
    with training compute. The one exception is buffer donation
    (`eager_get=True`): donated buffers are invalidated by the next step, so
    the device_get must happen before `save` returns (the file write still
    overlaps).

    Writes to the same path are serialized by the single worker (FIFO), and
    pending saves to the same path COALESCE (newest wins): a backlog never
    pins more than one snapshot per path. Worker errors are re-raised on the
    next `save`/`wait` — a failing checkpoint must not be silent (the
    preemption-resume contract depends on it existing).

    Memory discipline: the worker pulls every piece to host (`device_get`)
    and drops the device references BEFORE starting the file write. Holding
    jax arrays for the npz write's full duration pins an entire extra
    generation of params+opt_state in HBM — observed as a
    RESOURCE_EXHAUSTED in epoch 2 of a hidden-128 run on a 16 GB v5e, where
    the epoch-1 checkpoint (~3.4 GB of f32 params + Adam moments) stayed
    pinned under the next epoch's un-donated step transients.
    """

    _ARRAY_KEYS = ("params", "state", "opt_state", "extra")

    def __init__(self):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue()
        self._pending: dict = {}  # path -> kwargs of the NEWEST enqueued save
        self._lock = threading.Lock()
        self._exc = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            path = self._q.get()
            try:
                if path is None:
                    return
                with self._lock:
                    kwargs = self._pending.pop(path, None)
                if kwargs is None:
                    continue  # coalesced into a newer save for this path
                on_written = kwargs.pop("on_written", None)
                # host-get first, releasing device buffers before the write
                for k in self._ARRAY_KEYS:
                    if kwargs.get(k) is not None:
                        kwargs[k] = jax.device_get(kwargs[k])
                save(path, **kwargs)
                if on_written is not None:
                    # post-write hook (e.g. refreshing the task-level
                    # last.ckpt symlink): runs only after os.replace landed,
                    # so consumers following the link never see ENOENT
                    # (ADVICE r3: link-before-write dangled)
                    on_written()
            except BaseException as e:  # noqa: BLE001 — surfaced on next call
                self._exc = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc

    def save(self, path, *, eager_get=False, on_written=None, **kwargs):
        self._check()
        if on_written is not None:
            kwargs["on_written"] = on_written
        if eager_get:
            for k in self._ARRAY_KEYS:
                if kwargs.get(k) is not None:
                    kwargs[k] = jax.device_get(kwargs[k])
        with self._lock:
            replacing = path in self._pending
            self._pending[path] = kwargs  # newest wins; stale refs drop now
        if not replacing:
            self._q.put(path)
        return path

    def wait(self):
        """Block until every enqueued checkpoint is on disk; re-raise errors."""
        self._q.join()
        self._check()

    def close(self):
        self.wait()
        self._q.put(None)
        self._thread.join()


def restore_opt_state(template_opt_state, leaves):
    """Rebuild an optax state from its saved leaf list.

    `template_opt_state` is a freshly `tx.init(params)`-ed state with the
    right structure (and, under a mesh, the right shardings — mu/nu inherit
    the param layout). Each saved leaf is cast to the template leaf's dtype
    and placed on its sharding, so a resumed multi-chip run keeps the
    Adam moments distributed exactly as a fresh one would.
    """
    import jax.numpy as jnp

    flat, treedef = jax.tree.flatten(template_opt_state)
    if len(flat) != len(leaves):
        raise ValueError(
            f"checkpointed opt_state has {len(leaves)} leaves; optimizer "
            f"expects {len(flat)} — optimizer config changed since save"
        )
    out = []
    for tgt, src in zip(flat, leaves):
        arr = jnp.asarray(np.asarray(src), dtype=tgt.dtype)
        if hasattr(tgt, "sharding"):
            arr = jax.device_put(arr, tgt.sharding)
        out.append(arr)
    return jax.tree.unflatten(treedef, out)
