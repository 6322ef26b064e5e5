"""AOT export + serving artifacts: compile-once, serve-anywhere inference.

The reference has no deployment story beyond "load the Lightning ckpt in a
Python process that has the whole model zoo importable" (README.md:33-37).
For production TPU serving that is the wrong shape: the serving host should
not need the model-building code, a tracer, or a multi-minute XLA compile at
process start. This module packages a checkpointed model's inference
function as a **self-contained artifact**:

    .ddx file = zip archive of
      program.bin   serialized `jax.export.Exported` StableHLO program,
                    signature (flat_params..., images) -> mask; lowered for
                    an explicit platform list (tpu and/or cpu), versioned
                    with jax.export's stability guarantees
      params.npz    the parameter pytree, flattened with the same
                    '/'-joined naming as checkpoints/io.py
      meta.json     batch size, image dims, precision, task name, platforms,
                    framework version

Export bakes the model STATE (BN statistics, int8 scales) into the program
as constants — serving is stateless — while PARAMS stay a runtime argument,
so a re-finetuned checkpoint with identical shapes can be hot-swapped into
an already-exported artifact via `swap_params`.

`load(path)` -> a `Served` handle that runs the program with zero Python
model code (jax.export.deserialize + .call). cli/serve.py drives it either
one-shot over an .npz of scenes or as a minimal HTTP batch server.
"""
from __future__ import annotations

import io as _io
import json
import zipfile

import numpy as np

__all__ = ["export_roadmap", "load", "Served", "FORMAT_VERSION"]

FORMAT_VERSION = 1


def _flat_params(params, sort=True):
    """Deterministic (name, leaf) list for the params pytree ('/'-joined
    paths). Sorted by name = the argument order of the exported program;
    unsorted = jax.tree flatten order (for unflattening)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    named = []
    for path, leaf in flat:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        named.append((name, leaf))
    if sort:
        named.sort(key=lambda kv: kv[0])
    return named


def export_roadmap(ckpt_path, out_path, *, batch_size=1, precision=None,
                   platforms=("tpu", "cpu"), calib_images=None):
    """Export a roadmap checkpoint (framework .ckpt or raw Lightning rm.ckpt)
    to a .ddx serving artifact.

    precision 8 requires `calib_images` (a real [b, 6, 256, 306, 3] sample)
    so the static int8 activation scales bake into the program as constants.
    Returns the meta dict.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from driving_dirty_tpu.cli.run_test import load_roadmap_model

    task, params, state = load_roadmap_model(ckpt_path, precision)
    if task.int8_trunk:
        if calib_images is None:
            raise ValueError(
                "--precision 8 export needs calibration images (the static "
                "activation scales become program constants); pass calib_images"
            )
        task.calibrate_int8(params, state, jnp.asarray(calib_images))

    named = _flat_params(params)
    names = [n for n, _ in named]
    leaves = [jnp.asarray(l) for _, l in named]
    treedef = jax.tree.structure(params)
    # exported args arrive name-sorted; unflatten wants tree-flatten order
    order_names = [n for n, _ in _flat_params(params, sort=False)]

    def fn(*args):
        flat, images = args[:-1], args[-1]
        by_name = dict(zip(names, flat))
        p = jax.tree.unflatten(treedef, [by_name[n] for n in order_names])
        return task.predict(p, state, images)

    img_spec = jax.ShapeDtypeStruct((batch_size, 6, 256, 306, 3), jnp.float32)
    specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves] + [img_spec]
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(*specs)
    program = bytes(exported.serialize())

    meta = {
        "format_version": FORMAT_VERSION,
        "task": task.name,
        "batch_size": batch_size,
        "image_shape": [6, 256, 306, 3],
        "precision": precision or int(getattr(task.hparams, "precision", 32)),
        "platforms": list(platforms),
        "param_names": names,
        "output": "mask_800x800_float01",
    }
    buf = _io.BytesIO()
    np.savez(buf, **{n: np.asarray(l) for n, l in zip(names, leaves)})
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("program.bin", program)
        z.writestr("params.npz", buf.getvalue())
        z.writestr("meta.json", json.dumps(meta, indent=1))
    return meta


class Served:
    """A loaded .ddx artifact: `__call__(images)` runs the AOT program.

    No model code, no tracing: jax.export.deserialize + Exported.call. The
    first call per process still XLA-compiles the (already lowered, already
    optimized-HLO) program for the local device; subsequent calls reuse it.
    """

    def __init__(self, exported, param_arrays, meta):
        self._exported = exported
        self._params = param_arrays
        self.meta = meta
        self.batch_size = int(meta["batch_size"])
        self._jitted = None

    def swap_params(self, params_pytree):
        """Replace the serving weights with a same-shaped pytree (e.g. a
        newer finetune of the same architecture) without re-exporting."""
        named = _flat_params(params_pytree)
        if [n for n, _ in named] != list(self.meta["param_names"]):
            raise ValueError("param tree does not match the exported program")
        old = {n: a for n, a in zip(self.meta["param_names"], self._params)}
        for n, leaf in named:
            if tuple(np.shape(leaf)) != tuple(old[n].shape):
                raise ValueError(f"shape mismatch for {n}")
        self._params = [np.asarray(l) for _, l in named]
        self._jitted = None

    def __call__(self, images):
        import jax

        if self._jitted is None:
            # jit(exported.call) caches the local-device executable across
            # calls (plain .call re-traces per invocation)
            self._jitted = jax.jit(self._exported.call)
        images = np.asarray(images, np.float32)
        expect = (self.batch_size, *self.meta["image_shape"])
        if images.shape != expect:
            raise ValueError(f"expected images {expect}, got {images.shape}")
        return self._jitted(*self._params, images)


def load(path) -> Served:
    from jax import export as jexport

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        if meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(f"unsupported .ddx format {meta.get('format_version')}")
        exported = jexport.deserialize(bytearray(z.read("program.bin")))
        with np.load(_io.BytesIO(z.read("params.npz"))) as npz:
            params = [npz[n] for n in meta["param_names"]]
    return Served(exported, params, meta)
