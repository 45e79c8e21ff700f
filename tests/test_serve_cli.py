"""Serving-CLI tests: artifact loading (build_ranker), request dispatch, the
HTTP server, and the stdio JSONL loop — all against the library Ranker as the
oracle."""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recommendation_project_v2_tpu.cli.serve import (
    build_ranker,
    dispatch,
    make_server,
    serve_stdio,
)
from news_recommendation_project_v2_tpu.config import TowerConfig
from news_recommendation_project_v2_tpu.models.pooling import average_pool
from news_recommendation_project_v2_tpu.ops.encode import save_embeddings
from news_recommendation_project_v2_tpu.serve import Ranker

D = 16
N = 20


@pytest.fixture
def emb_dir(tmp_path, rng):
    emb = rng.standard_normal((N, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ids = np.array([f"N{i}" for i in range(N)])
    save_embeddings(tmp_path, "dev", emb, query_embeddings=emb, news_ids=ids)
    return tmp_path, emb, [str(i) for i in ids]


def test_build_ranker_meanpool_matches_library(emb_dir):
    path, emb, ids = emb_dir
    r = build_ranker(path, "dev")
    oracle = Ranker(lambda p, e, m: average_pool(e, m), None, emb, ids)
    got = r.rank(["N0", "N3"], ["N1", "N2", "N5"])
    want = oracle.rank(["N0", "N3"], ["N1", "N2", "N5"])
    assert [c for c, _ in got] == [c for c, _ in want]
    np.testing.assert_allclose([s for _, s in got], [s for _, s in want], atol=1e-6)


def test_build_ranker_requires_id_keyed_dump(tmp_path, rng):
    emb = rng.standard_normal((4, D)).astype(np.float32)
    save_embeddings(tmp_path, "dev", emb)  # positional-only dump
    with pytest.raises(FileNotFoundError, match="id-keyed"):
        build_ranker(tmp_path, "dev")


def test_build_ranker_restores_tower_checkpoint(emb_dir, tmp_path):
    from news_recommendation_project_v2_tpu.models import build_tower
    from news_recommendation_project_v2_tpu.train.checkpoint import save_pytree

    path, emb, ids = emb_dir
    cfg = TowerConfig(
        kind="latent", embedding_dim=D, reduced_dim=D, hidden_dim=4 * D,
        num_latents=4, latent_dim_head=8,
    )
    tower = build_tower(cfg)
    params = tower.init(jax.random.key(0), jnp.zeros((1, 8, D)), jnp.ones((1, 8)))
    ckpt = tmp_path / "ckpt" / "Best_model_x"
    save_pytree(ckpt, params)

    r = build_ranker(path, "dev", ckpt=ckpt, tower_config=cfg)
    oracle = Ranker(lambda p, e, m: tower.apply(p, e, m), params, emb, ids,
                    query_news_emb=emb)
    got = r.rank(["N0", "N3"], ["N1", "N2"])
    want = oracle.rank(["N0", "N3"], ["N1", "N2"])
    assert [c for c, _ in got] == [c for c, _ in want]
    np.testing.assert_allclose([s for _, s in got], [s for _, s in want], atol=1e-5)


def test_dispatch_ops_and_json_safety(emb_dir):
    path, emb, ids = emb_dir
    r = build_ranker(path, "dev")
    out = dispatch(r, "rank", {"history": ["N0"], "candidates": ["N1", "NOPE"]})
    assert out["ranked"][-1] == ["NOPE", None]  # -inf -> null, still last
    json.dumps(out)  # strictly serializable
    out = dispatch(r, "retrieve", {"history": ["N0"], "k": 3})
    assert len(out["ranked"]) == 3 and out["ranked"][0][0] == "N0"
    out = dispatch(
        r,
        "rank_batch",
        {"requests": [
            {"history": ["N0"], "candidates": ["N1", "N2"]},
            {"history": ["N3", "N4"], "candidates": ["N5", "N6", "N7"]},
        ]},
    )
    assert len(out["results"]) == 2 and len(out["results"][1]) == 3
    with pytest.raises(ValueError, match="unknown op"):
        dispatch(r, "nope", {})


def test_warmup_compiles_all_buckets(emb_dir):
    """warmup() must touch one program per (history, candidate) bucket pair
    plus a retrieve per history bucket, and subsequent ranks reuse them."""
    path, _, _ = emb_dir
    r = build_ranker(path, "dev")
    r.buckets = (2, 4)
    r.candidate_buckets = (2, 8)
    n = r.warmup()
    assert n == 2 * (2 + 1)  # 2 hist buckets x (2 cand buckets + 1 retrieve)
    out = r.rank(["N0", "N1"], ["N2", "N3", "N4"])  # lands in warmed shapes
    assert len(out) == 3


def test_http_server_roundtrip(emb_dir):
    path, _, _ = emb_dir
    r = build_ranker(path, "dev")
    server = make_server(r, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as resp:
            assert json.loads(resp.read())["news"] == N

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/rank",
            data=json.dumps(
                {"history": ["N0"], "candidates": ["N1", "N2", "N0"]}
            ).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            ranked = json.loads(resp.read())["ranked"]
        assert ranked[0][0] == "N0"  # history item is its own best match

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/rank", data=b"{}", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad)
        assert e.value.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_stdio_survives_non_object_lines(emb_dir):
    """A JSONL line whose value isn't an object must produce an error line,
    not kill the loop."""
    path, _, _ = emb_dir
    r = build_ranker(path, "dev")
    stdin = io.StringIO(
        "5\n"
        '"just a string"\n'
        + json.dumps({"op": "retrieve", "history": ["N0"], "k": 1}) + "\n"
    )
    stdout = io.StringIO()
    serve_stdio(r, stdin=stdin, stdout=stdout)
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert "must be a JSON object" in lines[0]["error"]
    assert "must be a JSON object" in lines[1]["error"]
    assert lines[2]["ranked"][0][0] == "N0"  # loop kept serving


def test_stdio_jsonl_loop(emb_dir):
    path, _, _ = emb_dir
    r = build_ranker(path, "dev")
    stdin = io.StringIO(
        json.dumps({"op": "retrieve", "history": ["N0"], "k": 2}) + "\n"
        + "\n"  # blank lines are skipped
        + json.dumps({"op": "bogus"}) + "\n"
    )
    stdout = io.StringIO()
    serve_stdio(r, stdin=stdin, stdout=stdout)
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert len(lines) == 2
    assert lines[0]["ranked"][0][0] == "N0"
    assert "unknown op" in lines[1]["error"]


def test_build_ranker_rejects_mismatched_tower_dim(emb_dir, tmp_path):
    """A latent checkpoint whose reduced_dim disagrees with the embedding
    dump's width must hit the shared loud boundary (models.
    check_tower_input_dim), not an opaque flax broadcast error."""
    path, _, _ = emb_dir
    cfg = TowerConfig(
        kind="latent", reduced_dim=2 * D, num_latents=4, latent_dim_head=8
    )
    with pytest.raises(ValueError, match="reduced_dim"):
        build_ranker(path, "dev", ckpt=tmp_path / "nonexistent", tower_config=cfg)


def test_build_ranker_mesh_matches_plain(emb_dir):
    """--mesh serving (round 5): a mesh-built ranker answers the same ranked
    lists as the plain one through the CLI assembly + dispatch path."""
    from news_recommendation_project_v2_tpu.config import MeshConfig
    from news_recommendation_project_v2_tpu.parallel import build_mesh

    path, emb, ids = emb_dir
    mesh = build_mesh(MeshConfig(data_size=4, model_size=2))
    pod = build_ranker(path, "dev", mesh=mesh)
    assert pod.mesh is mesh
    plain = build_ranker(path, "dev")
    req = {"history": ["N0", "N3"], "candidates": ["N1", "N2", "N5", "NOPE"]}
    got = dispatch(pod, "rank", req)["ranked"]
    want = dispatch(plain, "rank", req)["ranked"]
    assert [c for c, _ in got] == [c for c, _ in want]
    got_r = dispatch(pod, "retrieve", {"history": ["N0"], "k": 4})["ranked"]
    want_r = dispatch(plain, "retrieve", {"history": ["N0"], "k": 4})["ranked"]
    assert [c for c, _ in got_r] == [c for c, _ in want_r]
