"""AOT export + serving artifacts: compile-once, serve-anywhere inference.

The reference has no deployment story beyond "load the Lightning ckpt in a
Python process that has the whole model zoo importable" (README.md:33-37).
For production TPU serving that is the wrong shape: the serving host should
not need the model-building code, a tracer, or a multi-minute XLA compile at
process start. This module packages a checkpointed model's inference
function as a **self-contained artifact**:

    .ddx file = zip archive of
      program.bin   serialized `jax.export.Exported` StableHLO program,
                    signature (flat_params..., *inputs) -> outputs; lowered
                    for an explicit platform list (tpu and/or cpu),
                    versioned with jax.export's stability guarantees
      params.npz    the parameter pytree, flattened with the same
                    '/'-joined naming as checkpoints/io.py
      meta.json     input specs, batch size, precision, task name,
                    platforms, framework version

Export bakes the model STATE (BN statistics, int8 scales) into the program
as constants — serving is stateless — while PARAMS stay a runtime argument,
so a re-finetuned checkpoint with identical shapes can be hot-swapped into
an already-exported artifact via `swap_params`.

Exporters: `export_roadmap` (6 camera views -> 800x800 road mask, the
primary benchmark surface) and `export_detection` (views [+ roadmap channel
for the rm variant] -> fixed-shape detections dict). `load(path)` -> a
`Served` handle that runs the program with zero Python model code
(jax.export.deserialize + .call). cli/serve.py drives it either one-shot
over an .npz of scenes or as a minimal HTTP batch server.
"""
from __future__ import annotations

import io as _io
import json
import zipfile

import numpy as np

__all__ = ["export_roadmap", "export_detection", "export_spatial",
           "export_multitask", "load", "Served", "FORMAT_VERSION"]

FORMAT_VERSION = 2  # v2: named input specs (meta['inputs']) + pytree outputs


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


def _state_digest(state) -> str:
    """Order-stable digest of a model-state pytree (BN statistics, ...).
    Stored in the artifact meta so weight hot-swaps can detect that the
    incoming checkpoint was fine-tuned past the BAKED state (export folds
    state into the program as constants)."""
    import hashlib

    h = hashlib.sha1()
    for name, leaf in _flat_params(state):
        h.update(name.encode())
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()


def _export_artifact(predict, params, input_specs, out_path, platforms, meta):
    """Shared packaging: trace `predict(params, *inputs)` at the given input
    specs, serialize, and zip together with the flattened params + meta."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    # one flatten: tree order for unflattening, name-sorted for the program's
    # argument order
    unsorted_named = _flat_params(params, sort=False)
    order_names = [n for n, _ in unsorted_named]
    named = sorted(unsorted_named, key=lambda kv: kv[0])
    names = [n for n, _ in named]
    leaves = [jnp.asarray(l) for _, l in named]
    treedef = jax.tree.structure(params)

    def fn(*args):
        flat, inputs = args[: len(names)], args[len(names):]
        by_name = dict(zip(names, flat))
        p = jax.tree.unflatten(treedef, [by_name[n] for n in order_names])
        return predict(p, *inputs)

    specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves] + [
        jax.ShapeDtypeStruct(tuple(s["shape"]), jnp.dtype(s["dtype"]))
        for s in input_specs
    ]
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(*specs)

    meta = dict(meta)
    meta.update(
        format_version=FORMAT_VERSION,
        platforms=list(platforms),
        param_names=names,
        inputs=input_specs,
    )
    buf = _io.BytesIO()
    np.savez(buf, **{n: np.asarray(l) for n, l in zip(names, leaves)})
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("program.bin", bytes(exported.serialize()))
        z.writestr("params.npz", buf.getvalue())
        z.writestr("meta.json", json.dumps(meta, indent=1))
    return meta


def export_roadmap(ckpt_path, out_path, *, batch_size=1, precision=None,
                   platforms=("tpu", "cpu"), calib_images=None):
    """Export a roadmap checkpoint (framework .ckpt or raw Lightning rm.ckpt)
    to a .ddx serving artifact: images [b, 6, 256, 306, 3] -> mask
    [b, 800, 800].

    precision 8 requires `calib_images` (a real [b, 6, 256, 306, 3] sample)
    so the static int8 activation scales bake into the program as constants.
    Returns the meta dict.
    """
    import jax.numpy as jnp

    from driving_dirty_tpu.cli.run_test import load_roadmap_model

    task, params, state = load_roadmap_model(ckpt_path, precision)
    if task.int8_trunk:
        if calib_images is None:
            raise ValueError(
                "--precision 8 export needs calibration images (the static "
                "activation scales become program constants); pass calib_images"
            )
        task.calibrate_int8(params, state, jnp.asarray(calib_images))

    return _export_artifact(
        lambda p, images: task.predict(p, state, images),
        params,
        [{"name": "images", "shape": [batch_size, 6, 256, 306, 3],
          "dtype": "float32", "uint8_scale": True}],
        out_path, platforms,
        {"task": task.name, "batch_size": batch_size,
         "precision": precision or int(getattr(task.hparams, "precision", 32)),
         "output": "mask_800x800_float01",
         "state_digest": _state_digest(state)},
    )


def export_detection(ckpt_path, out_path, *, batch_size=1, precision=None,
                     platforms=("tpu", "cpu"), calib=None):
    """Export a detection checkpoint (faster_rcnn / faster_rcnn_rm) to a
    .ddx artifact: images [b, 6, 256, 306, 3] (+ road [b, 800, 800] for the
    rm variant, fused as the 4th layout channel) -> fixed-shape detections
    {boxes [b, N, 4] pixel xyxy, scores [b, N], labels [b, N], valid [b, N]}.
    """
    import jax.numpy as jnp

    from driving_dirty_tpu.cli.eval_boxes import load_detection_task

    task, params, state = load_detection_task(ckpt_path, precision)
    if getattr(task, "int8_trunk", False):
        if calib is None:
            raise ValueError("--precision 8 export needs a calibration batch")
        task.calibrate_int8(params, state, jnp.asarray(calib["images"]),
                            None if calib.get("road") is None
                            else jnp.asarray(calib["road"]))

    from driving_dirty_tpu.models.pretrained import hp

    inputs = [{"name": "images", "shape": [batch_size, 6, 256, 306, 3],
               "dtype": "float32", "uint8_scale": True}]
    if task.uses_roadmap:
        inputs.append({"name": "road", "shape": [batch_size, 800, 800],
                       "dtype": "float32"})
        predict = lambda p, images, road: task.predict(p, state, images, road)
    else:
        predict = lambda p, images: task.predict(p, state, images)
    return _export_artifact(
        predict, params, inputs, out_path, platforms,
        {"task": task.name, "batch_size": batch_size,
         "precision": precision or int(hp(task.hparams, "precision", 32) or 32),
         "output": "detections_pixel_xyxy",
         "state_digest": _state_digest(state)},
    )


def _load_task_ckpt(ckpt_path, precision, classes):
    """Framework .ckpt -> (task, params, state) for any task family in
    `classes` (name -> class); same restore recipe as
    cli/eval_boxes.load_detection_task."""
    import jax
    import jax.numpy as jnp

    from driving_dirty_tpu.checkpoints import io as ckpt_io

    blob = ckpt_io.load(ckpt_path)
    task_name = blob["meta"].get("task")
    if task_name not in classes:
        raise ValueError(
            f"checkpoint task {task_name!r} is not one of {sorted(classes)}")
    hparams = dict(blob["hparams"] or {})
    hparams.setdefault("pretrained_path", None)
    if precision is not None:
        hparams["precision"] = precision
    task = classes[task_name](hparams)
    params = jax.tree.map(jnp.asarray, blob["params"])
    state = (jax.tree.map(jnp.asarray, blob["state"]) if blob.get("state")
             else task.init(jax.random.PRNGKey(0))[1])
    return task, params, state


def export_spatial(ckpt_path, out_path, *, batch_size=1, precision=None,
                   platforms=("tpu", "cpu"), calib_images=None):
    """Export a spatial occupancy checkpoint (spatial_bb / spatial_rm) to a
    .ddx artifact: images [b, 6, 256, 306, 3] (+ road [b, 800, 800] for the
    rm variant) -> occupancy probabilities [b, 800, 800]."""
    import jax.numpy as jnp

    from driving_dirty_tpu.models.spatial_bb import BBSpatialModel, BBSpatialRoadMap

    task, params, state = _load_task_ckpt(
        ckpt_path, precision,
        {"spatial_bb": BBSpatialModel, "spatial_rm": BBSpatialRoadMap},
    )
    if task.int8_trunk:
        if calib_images is None:
            raise ValueError("--precision 8 export needs calibration images")
        task.calibrate_int8(params, state, jnp.asarray(calib_images))

    inputs = [{"name": "images", "shape": [batch_size, 6, 256, 306, 3],
               "dtype": "float32", "uint8_scale": True}]
    if task.uses_roadmap:
        inputs.append({"name": "road", "shape": [batch_size, 800, 800],
                       "dtype": "float32"})
        predict = lambda p, images, road: task.predict(p, state, images, road)
    else:
        predict = lambda p, images: task.predict(p, state, images)
    return _export_artifact(
        predict, params, inputs, out_path, platforms,
        {"task": task.name, "batch_size": batch_size,
         "precision": precision or int(getattr(task.hparams, "precision", 32) or 32),
         "output": "occupancy_800x800_prob",
         "state_digest": _state_digest(state)},
    )


def export_multitask(ckpt_path, out_path, *, batch_size=1, precision=None,
                     platforms=("tpu", "cpu"), calib_images=None):
    """Export a multitask checkpoint to a .ddx artifact:
    images [b, 6, 256, 306, 3] -> {road_mask [b, 800, 800] binary,
    box_occupancy [b, 800, 800] probabilities} in one shared encoder pass."""
    import jax.numpy as jnp

    from driving_dirty_tpu.models.multitask import MultiTask

    task, params, state = _load_task_ckpt(
        ckpt_path, precision, {"multitask": MultiTask})
    if task.int8_trunk:
        if calib_images is None:
            raise ValueError("--precision 8 export needs calibration images")
        task.calibrate_int8(params, state, jnp.asarray(calib_images))

    return _export_artifact(
        lambda p, images: task.predict(p, state, images),
        params,
        [{"name": "images", "shape": [batch_size, 6, 256, 306, 3],
          "dtype": "float32", "uint8_scale": True}],
        out_path, platforms,
        {"task": task.name, "batch_size": batch_size,
         "precision": precision or int(getattr(task.hparams, "precision", 32) or 32),
         "output": "road_mask_and_box_occupancy_800x800",
         "state_digest": _state_digest(state)},
    )


class Served:
    """A loaded .ddx artifact: `__call__(*inputs)` runs the AOT program.

    No model code, no tracing: jax.export.deserialize + Exported.call. The
    first call per process still XLA-compiles the (already lowered, already
    optimized-HLO) program for the local device; subsequent calls reuse it.
    """

    def __init__(self, exported, param_arrays, meta):
        import jax.numpy as jnp

        self._exported = exported
        # device-resident once: numpy args would re-upload the whole weight
        # set host->HBM on EVERY call (48+ MB per request on the roadmap
        # artifact)
        self._params = [jnp.asarray(a) for a in param_arrays]
        self.meta = meta
        self.batch_size = int(meta["batch_size"])
        self._jitted = None

    @property
    def input_specs(self):
        return self.meta["inputs"]

    def swap_params(self, params_pytree, state=None, force=False):
        """Replace the serving weights with a same-shaped pytree (e.g. a
        newer finetune of the same architecture) without re-exporting.

        The exported program BAKES the model state (BN statistics, int8
        scales) as constants — weights can swap, state cannot. Pass the new
        checkpoint's `state` so a drifted state is detected: if its digest
        differs from the one baked at export, the swap is refused (the model
        would run new weights against stale statistics) unless force=True.
        """
        import jax.numpy as jnp

        if state is not None and not force:
            baked = self.meta.get("state_digest")
            if baked is not None and _state_digest(state) != baked:
                raise ValueError(
                    "checkpoint state differs from the state baked into this "
                    "artifact (BN statistics / int8 scales drifted during "
                    "fine-tuning) — re-export instead of hot-swapping, or "
                    "pass force=True to accept the skew"
                )
        named = _flat_params(params_pytree)
        if [n for n, _ in named] != list(self.meta["param_names"]):
            raise ValueError("param tree does not match the exported program")
        old = {n: a for n, a in zip(self.meta["param_names"], self._params)}
        for n, leaf in named:
            if tuple(np.shape(leaf)) != tuple(old[n].shape):
                raise ValueError(f"shape mismatch for {n}")
        self._params = [jnp.asarray(np.asarray(l)) for _, l in named]
        self._jitted = None

    def __call__(self, *inputs):
        import jax

        if self._jitted is None:
            # jit(exported.call) caches the local-device executable across
            # calls (plain .call re-traces per invocation)
            self._jitted = jax.jit(self._exported.call)
        specs = self.meta["inputs"]
        if len(inputs) != len(specs):
            raise ValueError(
                f"expected {len(specs)} inputs "
                f"({[s['name'] for s in specs]}), got {len(inputs)}")
        arrays = []
        for arr, spec in zip(inputs, specs):
            raw = np.asarray(arr)
            if spec.get("uint8_scale") and raw.dtype == np.uint8:
                # raw camera bytes (exporter declared this input takes them):
                # the program is traced at float32, where normalize_images
                # applies NO /255 (that rescale is keyed on integer dtypes) —
                # a silent cast would run the model on 0..255 inputs at 255x
                arr = raw / np.float32(255.0)
            else:
                arr = raw.astype(np.dtype(spec["dtype"]), copy=False)
            if arr.shape != tuple(spec["shape"]):
                raise ValueError(
                    f"expected {spec['name']} {tuple(spec['shape'])}, "
                    f"got {arr.shape}")
            arrays.append(arr)
        return self._jitted(*self._params, *arrays)


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
