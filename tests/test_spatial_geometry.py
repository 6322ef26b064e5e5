"""Geometry presets of the spatial pipeline (nn/spatial.py GEOMETRIES).

"reference" must reproduce the exact shapes of
/root/reference/src/bounding_box_model/spatial_bb/components.py
(256x306 views -> 256x256 grid -> 800x800 rasters). "small" is the same
network re-solved for 64x78 views; these tests pin that (a) every concat
inside the three components lines up at both geometries, (b) the parameter
pytree STRUCTURE (layer names, channel counts => sharding behavior) is
identical across geometries, and (c) a real small-geometry spatial_rm /
multitask loss step runs finitely — the contract the multi-chip dryrun
(__graft_entry__.dryrun_multichip) relies on.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from driving_dirty_tpu.nn.spatial import (
    GEOMETRIES,
    BoxesMergingCNN,
    RoadMapBoxesMergingCNN,
    SpatialMappingCNN,
)


def _c3_hw(view_hw):
    h, w = view_hw
    return (h + 2 - 3) // 2 + 1, (6 * w + 2 - 3) // 2 + 1


@pytest.mark.parametrize("geom", ["reference", "small"])
def test_component_shapes(geom):
    g = GEOMETRIES[geom]
    h, w = g["view_hw"]
    sp = SpatialMappingCNN(geometry=geom)
    p = jax.eval_shape(sp.init, jax.random.PRNGKey(0))[0]
    x = jnp.zeros((1, 6, h, w, 3))
    out = jax.eval_shape(lambda p, x: sp.apply(p, {}, x)[0], p, x)
    assert out.shape == (1,) + g["grid_hw"] + (32,)

    c3h, c3w = _c3_hw(g["view_hw"])
    ssr = jnp.zeros((1, c3h, c3w, 32))
    spm = jnp.zeros((1,) + g["grid_hw"] + (32,))

    bm = BoxesMergingCNN(geometry=geom)
    bp = jax.eval_shape(bm.init, jax.random.PRNGKey(0))[0]
    o = jax.eval_shape(lambda p, a, b: bm.apply(p, {}, a, b)[0], bp, ssr, spm)
    assert o.shape == (1, bm.raster_size, bm.raster_size, 1)

    rm = RoadMapBoxesMergingCNN(geometry=geom)
    rp = jax.eval_shape(rm.init, jax.random.PRNGKey(0))[0]
    road = jnp.zeros((1, rm.raster_size, rm.raster_size, 1))
    o2 = jax.eval_shape(
        lambda p, a, b, r: rm.apply(p, {}, a, b, r)[0], rp, ssr, spm, road
    )
    assert o2.shape == (1, rm.raster_size, rm.raster_size, 1)


def test_pytree_structure_identical_across_geometries():
    """Same layer names and channel counts => the sharding rules
    (models/spatial_bb.param_sharding_rules) partition both geometries
    identically; only kernel H/W (and hence spatial dims) differ."""
    for cls in (SpatialMappingCNN, BoxesMergingCNN, RoadMapBoxesMergingCNN):
        ref = jax.eval_shape(cls(geometry="reference").init, jax.random.PRNGKey(0))[0]
        sml = jax.eval_shape(cls(geometry="small").init, jax.random.PRNGKey(0))[0]
        assert set(ref) == set(sml)
        for name in ref:
            for leaf_name, leaf in ref[name].items():
                small_leaf = sml[name][leaf_name]
                assert leaf.ndim == small_leaf.ndim
                if leaf.ndim == 4:  # HWIO conv weights: channels identical
                    assert leaf.shape[2:] == small_leaf.shape[2:], (cls, name)
                else:
                    assert leaf.shape == small_leaf.shape, (cls, name)


def test_small_geometry_spatial_rm_step():
    """A real (non-eval_shape) loss/grad step of spatial_rm at the small
    geometry — what dryrun_multichip runs under the mesh."""
    from driving_dirty_tpu.models.basic_ae import BasicAE
    from driving_dirty_tpu.models.spatial_bb import BBSpatialRoadMap

    g = GEOMETRIES["small"]
    h, w = g["view_hw"]
    task = BBSpatialRoadMap(
        dict(pretrained_path=None, ae_hidden_dim=8, ae_latent_dim=8,
             batch_size=1, remat=False, spatial_geometry="small")
    )
    task.ae = BasicAE(dict(hidden_dim=8, latent_dim=8, input_height=h,
                           input_width=6 * w, output_height=h, output_width=w))
    task.latent_dim = 8
    assert task.raster_size == g["rm_raster"]
    params, state = task.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    boxes = np.zeros((1, 4, 2, 4), np.float32)
    boxes[:, 0, 0] = [5, 5, -5, -5]
    boxes[:, 0, 1] = [5, -5, 5, -5]
    valid = np.zeros((1, 4), bool)
    valid[:, 0] = True
    batch = {
        "images": jnp.asarray(rng.rand(1, 6, h, w, 3), jnp.float32),
        "road": jnp.asarray((rng.rand(1, g["rm_raster"], g["rm_raster"]) > 0.5),
                            jnp.float32),
        "boxes": jnp.asarray(boxes),
        "box_valid": jnp.asarray(valid),
    }
    loss, grads = jax.jit(
        lambda p: jax.value_and_grad(
            lambda q: task.loss(q, state, batch, jax.random.PRNGKey(1), train=True)[0]
        )(p)
    )(params)
    assert np.isfinite(float(loss))
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(grads)))
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_small_raster_scales_meter_transform():
    """boxes_to_binary_map keeps the (-40,40) m field of view at any raster
    size: a 2x2 m box at the origin covers ~the center at 152 px too."""
    from driving_dirty_tpu.ops.maps import boxes_to_binary_map

    boxes = jnp.asarray(
        [[[1.0, 1.0, -1.0, -1.0], [1.0, -1.0, 1.0, -1.0]]]
    )  # corners fl,fr,bl,br
    m800 = boxes_to_binary_map(boxes, size=800)
    m152 = boxes_to_binary_map(boxes, size=152)
    assert m800.shape == (800, 800) and m152.shape == (152, 152)
    # areas proportional to (scale)^2: 20x20 px at 800 -> (152/80)^2*4 px
    a800 = float(m800.sum())
    a152 = float(m152.sum())
    assert abs(a800 - 400.0) <= 80
    assert abs(a152 - 400.0 * (152 / 800) ** 2) <= 8
