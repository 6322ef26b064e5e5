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
    assert meta["image_shape"] == [6, 256, 306, 3]
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
