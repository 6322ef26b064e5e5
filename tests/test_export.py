"""AOT export + serving: a checkpoint round-trips through the .ddx artifact
(StableHLO program + weights + meta) and serves identical masks with no
model code — including the HTTP server surface and weight hot-swap."""
import io
import json
import threading
import urllib.request
import zipfile

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # 800x800 head compiles

import jax
import jax.numpy as jnp

from driving_dirty_tpu import export as ddx
from driving_dirty_tpu.checkpoints import io as ckpt_io
from driving_dirty_tpu.models.roadmap import RoadMapBCEv2

HPARAMS = dict(pretrained_path=None, ae_hidden_dim=8, ae_latent_dim=8,
               batch_size=2, precision=32)


@pytest.fixture(scope="module")
def rm_ckpt(tmp_path_factory):
    task = RoadMapBCEv2(dict(HPARAMS))
    params, state = task.init(jax.random.PRNGKey(0))
    path = str(tmp_path_factory.mktemp("exp") / "rm.ckpt")
    ckpt_io.save(path, params=params, state=state, hparams=dict(HPARAMS),
                 meta={"task": "roadmap_bce"})
    return path


@pytest.fixture(scope="module")
def artifact(rm_ckpt, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp_art") / "model.ddx")
    meta = ddx.export_roadmap(rm_ckpt, out, batch_size=2, platforms=("cpu",))
    assert meta["batch_size"] == 2
    return out


def test_artifact_contents(artifact):
    with zipfile.ZipFile(artifact) as z:
        names = set(z.namelist())
        assert {"program.bin", "params.npz", "meta.json"} <= names
        meta = json.loads(z.read("meta.json"))
    assert meta["format_version"] == ddx.FORMAT_VERSION
    assert meta["inputs"] == [{"name": "images",
                               "shape": [2, 6, 256, 306, 3],
                               "dtype": "float32", "uint8_scale": True}]
    assert meta["platforms"] == ["cpu"]


def test_served_matches_direct_predict(rm_ckpt, artifact):
    served = ddx.load(artifact)
    rng = np.random.RandomState(1)
    images = rng.rand(2, 6, 256, 306, 3).astype(np.float32)

    blob = ckpt_io.load(rm_ckpt)
    task = RoadMapBCEv2(dict(blob["hparams"]))
    direct = np.asarray(task.predict(
        jax.tree.map(jnp.asarray, blob["params"]),
        jax.tree.map(jnp.asarray, blob["state"]), jnp.asarray(images)))

    out = np.asarray(served(images))
    assert out.shape == (2, 800, 800)
    np.testing.assert_array_equal(out, direct)


def test_served_rejects_bad_shape(artifact):
    served = ddx.load(artifact)
    with pytest.raises(ValueError, match="expected images"):
        served(np.zeros((1, 6, 256, 306, 3), np.float32))


def test_swap_params(rm_ckpt, artifact):
    served = ddx.load(artifact)
    images = np.random.RandomState(2).rand(2, 6, 256, 306, 3).astype(np.float32)
    base = np.asarray(served(images))

    # same-architecture reinit = a "newer finetune": swap changes the output
    task = RoadMapBCEv2(dict(HPARAMS))
    params2, _ = task.init(jax.random.PRNGKey(7))
    served.swap_params(params2)
    swapped = np.asarray(served(images))
    assert swapped.shape == base.shape
    assert (swapped != base).any()

    # wrong shapes refused
    bad = jax.tree.map(lambda x: np.zeros((3, 3), np.float32), params2)
    with pytest.raises(ValueError):
        served.swap_params(bad)


def test_serve_cli_oneshot(artifact, tmp_path, capsys):
    from driving_dirty_tpu.cli import serve

    images = (np.random.RandomState(3).rand(3, 6, 256, 306, 3) * 255).astype(np.uint8)
    inp, out = str(tmp_path / "in.npz"), str(tmp_path / "out.npz")
    np.savez(inp, images=images)
    serve.main(["--artifact", artifact, "--npz", inp, "--out", out])
    assert "3 scenes" in capsys.readouterr().out
    with np.load(out) as z:
        masks = z["masks"]
    assert masks.shape == (3, 800, 800)  # batch-2 artifact, padded tail dropped
    assert set(np.unique(masks)) <= {0, 1}


def test_serve_http(artifact):
    from driving_dirty_tpu.cli import serve

    served = ddx.load(artifact)
    srv = serve.make_server(served, 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            meta = json.loads(r.read())
        assert meta["batch_size"] == 2

        images = np.random.RandomState(4).rand(2, 6, 256, 306, 3).astype(np.float32)
        buf = io.BytesIO()
        np.savez(buf, images=images)
        req = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as r:
            assert float(r.headers["X-Scenes-Per-Sec"]) > 0
            with np.load(io.BytesIO(r.read())) as z:
                masks = z["masks"]
        assert masks.shape == (2, 800, 800)

        # malformed body -> 400, server survives
        req = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                     data=b"not an npz", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert r.status == 200
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.fixture(scope="module")
def det_artifact(tmp_path_factory):
    """A faster_rcnn_rm detection artifact (images + road inputs ->
    fixed-shape detections dict)."""
    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    # exact_topk: the default approx_max_k proposal selection may pick
    # different near-tied candidates in two separately-compiled programs
    # (random-init scores tie); exact selection makes artifact-vs-direct
    # comparison deterministic
    hp = dict(pretrained_path=None, ae_hidden_dim=8, ae_latent_dim=8,
              batch_size=2, rpn_pre_nms_top_n=64, rpn_post_nms_top_n=32,
              box_batch_per_image=32, exact_topk=1)
    task = FasterRCNNRoadMap(hp)
    params, state = task.init(jax.random.PRNGKey(0))
    d = tmp_path_factory.mktemp("det_exp")
    ckpt = str(d / "fr.ckpt")
    ckpt_io.save(ckpt, params=params, state=state, hparams=hp,
                 meta={"task": "faster_rcnn_rm"})
    out = str(d / "det.ddx")
    meta = ddx.export_detection(ckpt, out, batch_size=2, platforms=("cpu",))
    assert [s["name"] for s in meta["inputs"]] == ["images", "road"]
    return ckpt, out


def test_detection_export_matches_direct(det_artifact):
    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    ckpt, art = det_artifact
    served = ddx.load(art)
    rng = np.random.RandomState(5)
    images = rng.rand(2, 6, 256, 306, 3).astype(np.float32)
    road = (rng.rand(2, 800, 800) > 0.5).astype(np.float32)

    out = served(images, road)
    assert set(out.keys()) >= {"boxes", "scores", "labels", "valid"}
    assert np.asarray(out["boxes"]).shape[0] == 2

    blob = ckpt_io.load(ckpt)
    task = FasterRCNNRoadMap(dict(blob["hparams"], pretrained_path=None))
    direct = task.predict(jax.tree.map(jnp.asarray, blob["params"]),
                          jax.tree.map(jnp.asarray, blob["state"]),
                          jnp.asarray(images), jnp.asarray(road))
    # Two separately-compiled XLA programs are not bitwise-identical: fp
    # rounding differences at selection boundaries (top-k / NMS ties on
    # random-init scores) can swap a couple of detections. Require the
    # detection SETS to agree: same valid counts, sorted scores close, and
    # >= 95% of box rows identical.
    np.testing.assert_array_equal(np.asarray(out["valid"]),
                                  np.asarray(direct["valid"]))
    np.testing.assert_allclose(
        np.sort(np.asarray(out["scores"]), axis=-1),
        np.sort(np.asarray(direct["scores"]), axis=-1), rtol=1e-3, atol=1e-4)
    rows_equal = np.all(
        np.abs(np.asarray(out["boxes"]) - np.asarray(direct["boxes"])) < 1e-2,
        axis=-1)
    assert rows_equal.mean() >= 0.95, f"only {rows_equal.mean():.1%} rows match"


def test_detection_serve_cli_oneshot(det_artifact, tmp_path, capsys):
    from driving_dirty_tpu.cli import serve

    _, art = det_artifact
    rng = np.random.RandomState(6)
    inp, out = str(tmp_path / "in.npz"), str(tmp_path / "det.npz")
    np.savez(inp, images=rng.rand(3, 6, 256, 306, 3).astype(np.float32),
             road=(rng.rand(3, 800, 800) > 0.5).astype(np.float32))
    serve.main(["--artifact", art, "--npz", inp, "--out", out])
    assert "3 scenes" in capsys.readouterr().out
    with np.load(out) as z:
        assert z["boxes"].shape[0] == 3
        assert z["scores"].shape == z["labels"].shape


def test_int8_export_requires_calibration_and_runs(rm_ckpt, tmp_path):
    """precision-8 export without a calibration batch is refused; with one,
    the static int8 scales bake into the program and the artifact serves."""
    out = str(tmp_path / "int8.ddx")
    with pytest.raises(ValueError, match="calibration"):
        ddx.export_roadmap(rm_ckpt, out, batch_size=2, precision=8,
                           platforms=("cpu",))

    rng = np.random.RandomState(8)
    calib = rng.rand(2, 6, 256, 306, 3).astype(np.float32)
    meta = ddx.export_roadmap(rm_ckpt, out, batch_size=2, precision=8,
                              platforms=("cpu",), calib_images=calib)
    assert meta["precision"] == 8
    served = ddx.load(out)
    masks = np.asarray(served(calib))
    assert masks.shape == (2, 800, 800)
    assert set(np.unique(masks)) <= {0.0, 1.0}


def test_served_normalizes_raw_uint8_images(rm_ckpt, artifact):
    """Raw uint8 camera bytes through serving == the float/255 path (the
    program is traced at float32, so a silent cast would run at 255x)."""
    served = ddx.load(artifact)
    raw = (np.random.RandomState(9).rand(2, 6, 256, 306, 3) * 255).astype(np.uint8)
    out_u8 = np.asarray(served(raw))
    out_f = np.asarray(served(raw.astype(np.float32) / 255.0))
    np.testing.assert_array_equal(out_u8, out_f)


def test_swap_params_refuses_drifted_state(rm_ckpt, artifact):
    """A fine-tuned checkpoint whose BN state drifted past the baked one is
    refused (state is a program constant); force=True overrides."""
    served = ddx.load(artifact)
    task = RoadMapBCEv2(dict(HPARAMS))
    params2, state2 = task.init(jax.random.PRNGKey(11))
    # same-digest path: the original ckpt's own state passes
    blob = ckpt_io.load(rm_ckpt)
    served.swap_params(blob["params"], state=blob["state"])

    drifted = jax.tree.map(lambda x: x + 1.0, blob["state"])
    with pytest.raises(ValueError, match="re-export"):
        served.swap_params(params2, state=drifted)
    served.swap_params(params2, state=drifted, force=True)  # explicit accept


def test_predict_all_rejects_empty_batch(artifact):
    from driving_dirty_tpu.cli import serve

    served = ddx.load(artifact)
    with pytest.raises(ValueError, match="no scenes"):
        serve.predict_all(served, np.zeros((0, 6, 256, 306, 3), np.float32))


@pytest.fixture(scope="module")
def spatial_artifact(tmp_path_factory):
    """A spatial_rm artifact (images + road -> occupancy probabilities)."""
    from driving_dirty_tpu.models.spatial_bb import BBSpatialRoadMap

    hp = dict(pretrained_path=None, ae_hidden_dim=8, ae_latent_dim=8,
              batch_size=2, precision=32)
    task = BBSpatialRoadMap(hp)
    params, state = task.init(jax.random.PRNGKey(0))
    d = tmp_path_factory.mktemp("sp_exp")
    ckpt = str(d / "sp.ckpt")
    ckpt_io.save(ckpt, params=params, state=state, hparams=hp,
                 meta={"task": "spatial_rm"})
    out = str(d / "sp.ddx")
    meta = ddx.export_spatial(ckpt, out, batch_size=2, platforms=("cpu",))
    assert [s["name"] for s in meta["inputs"]] == ["images", "road"]
    assert meta["output"] == "occupancy_800x800_prob"
    return ckpt, out


def test_spatial_export_matches_direct(spatial_artifact):
    from driving_dirty_tpu.models.spatial_bb import BBSpatialRoadMap

    ckpt, art = spatial_artifact
    served = ddx.load(art)
    rng = np.random.RandomState(12)
    images = rng.rand(2, 6, 256, 306, 3).astype(np.float32)
    road = (rng.rand(2, 800, 800) > 0.5).astype(np.float32)
    out = np.asarray(served(images, road))
    assert out.shape == (2, 800, 800)
    assert 0.0 <= out.min() and out.max() <= 1.0

    blob = ckpt_io.load(ckpt)
    task = BBSpatialRoadMap(dict(blob["hparams"]))
    direct = np.asarray(task.predict(
        jax.tree.map(jnp.asarray, blob["params"]),
        jax.tree.map(jnp.asarray, blob["state"]),
        jnp.asarray(images), jnp.asarray(road)))
    np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def multitask_artifact(tmp_path_factory):
    from driving_dirty_tpu.models.multitask import MultiTask

    hp = dict(pretrained_path=None, ae_hidden_dim=8, ae_latent_dim=8,
              batch_size=2, precision=32)
    task = MultiTask(hp)
    params, state = task.init(jax.random.PRNGKey(0))
    d = tmp_path_factory.mktemp("mt_exp")
    ckpt = str(d / "mt.ckpt")
    ckpt_io.save(ckpt, params=params, state=state, hparams=hp,
                 meta={"task": "multitask"})
    out = str(d / "mt.ddx")
    meta = ddx.export_multitask(ckpt, out, batch_size=2, platforms=("cpu",))
    assert meta["output"] == "road_mask_and_box_occupancy_800x800"
    return ckpt, out


def test_multitask_export_matches_direct(multitask_artifact):
    from driving_dirty_tpu.models.multitask import MultiTask

    ckpt, art = multitask_artifact
    served = ddx.load(art)
    rng = np.random.RandomState(13)
    images = rng.rand(2, 6, 256, 306, 3).astype(np.float32)
    out = served(images)
    assert set(out.keys()) == {"road_mask", "box_occupancy"}
    mask = np.asarray(out["road_mask"])
    occ = np.asarray(out["box_occupancy"])
    assert mask.shape == occ.shape == (2, 800, 800)
    assert set(np.unique(mask)) <= {0.0, 1.0}

    blob = ckpt_io.load(ckpt)
    task = MultiTask(dict(blob["hparams"]))
    direct = task.predict(
        jax.tree.map(jnp.asarray, blob["params"]),
        jax.tree.map(jnp.asarray, blob["state"]), jnp.asarray(images))
    np.testing.assert_array_equal(mask, np.asarray(direct["road_mask"]))
    np.testing.assert_allclose(occ, np.asarray(direct["box_occupancy"]),
                               rtol=1e-5, atol=1e-6)


def test_load_task_ckpt_rejects_wrong_family(spatial_artifact, tmp_path):
    ckpt, _ = spatial_artifact
    with pytest.raises(ValueError, match="spatial_rm"):
        ddx.export_multitask(ckpt, str(tmp_path / "x.ddx"), platforms=("cpu",))
