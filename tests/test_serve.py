"""HTTP serving smoke test: boot the real ThreadingHTTPServer on an
ephemeral port, hit /, /stvg and /reload, and check the grounding JSON
(the reference's CherryPy endpoint surface, /root/reference/server_stvg.py)."""

import json
import threading
import urllib.error
import urllib.parse
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from tubedetr_tpu.apps.serve import Server, make_handler
from tubedetr_tpu.config import TubeDETRConfig


@pytest.fixture(scope="module")
def server_and_url(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("serve")
    rng = np.random.RandomState(0)
    clip = rng.randint(0, 255, (6, 48, 64, 3), dtype=np.uint8)
    np.save(tmp_path / "clip.npy", clip)

    cfg = TubeDETRConfig(
        backbone="resnet14",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=1,
        dim_feedforward=64,
        video_max_len=6,
        video_max_len_train=6,
        stride=2,
        resolution=128,
        max_text_len=8,
        text_vocab_size=128,
        text_hidden_size=32,
        text_layers=1,
        text_heads=4,
        text_ffn=64,
        text_max_positions=40,
        fast=True,
        guided_attn=False,
        sted=True,
        aux_loss=False,
        dropout=0.0,
        output_dir=str(tmp_path / "out"),
    )
    server = Server(cfg, video_root=str(tmp_path))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    yield server, f"http://127.0.0.1:{port}"
    httpd.shutdown()


@pytest.fixture(scope="module")
def live_server(server_and_url):
    return server_and_url[1]


@pytest.fixture(scope="module")
def server_obj(server_and_url):
    return server_and_url[0]


def test_index_lists_videos(live_server):
    html = urllib.request.urlopen(f"{live_server}/", timeout=30).read().decode()
    assert "clip.npy" in html
    assert "Spatio-Temporal Video Grounding" in html


def test_reload_endpoint_without_checkpoint(live_server):
    body = urllib.request.urlopen(f"{live_server}/reload", timeout=30).read()
    out = json.loads(body)
    assert out["reloaded"] is None  # nothing configured -> honest no-op


def test_reload_actually_swaps_weights(live_server, server_obj):
    """POST /reload?ckpt=... must replace the live parameters
    (/root/reference/server_stvg.py:284-301)."""
    import jax

    from tubedetr_tpu.train.checkpoint import save_checkpoint

    pipe = server_obj.pipeline
    scaled = jax.tree_util.tree_map(
        lambda x: np.asarray(x) * 0.5, pipe.variables["params"]
    )
    ck_path = server_obj.out_dir + "/swap.ckpt"
    save_checkpoint(ck_path, scaled, pipe.variables.get("buffers", {}))
    before = np.asarray(
        jax.tree_util.tree_leaves(pipe.variables["params"])[0]
    ).copy()
    req = urllib.request.Request(
        f"{live_server}/reload?ckpt=swap.ckpt", method="POST"
    )
    out = json.loads(urllib.request.urlopen(req, timeout=120).read())
    assert out["reloaded"].endswith("swap.ckpt")
    after = np.asarray(jax.tree_util.tree_leaves(pipe.variables["params"])[0])
    np.testing.assert_allclose(after, before * 0.5, rtol=1e-6)


def test_stvg_endpoint_grounds_a_clip(live_server, server_obj):
    url = f"{live_server}/stvg?video=clip.npy&question=a+red+square&start=-1&end=-1"
    resp = urllib.request.urlopen(url, timeout=600)
    out = json.loads(resp.read())
    assert "sted" in out and "boxes" in out
    s, e = out["sted"]
    assert 0 <= s < e <= 7
    assert len(out["boxes"]) == 6
    # compile-once serving: a second identical request reuses the jitted
    # executable (the forward traced exactly once; _cache_size() is a
    # GLOBAL bounded cache and under-reports in the full-suite process)
    urllib.request.urlopen(url, timeout=600).read()
    assert server_obj.pipeline.trace_count == 1


def test_healthz_and_stats_endpoints(live_server):
    """Observability surface (beyond the reference): /healthz answers
    without touching the model; /stats counts successes/failures and
    reports latency quantiles over the sliding window."""
    health = json.loads(
        urllib.request.urlopen(f"{live_server}/healthz", timeout=30).read()
    )
    assert health == {"status": "ok"}

    def stats():
        return json.loads(
            urllib.request.urlopen(f"{live_server}/stats", timeout=30).read()
        )

    before = stats()
    assert before["status"] == "ok"
    assert before["model"]["backbone"] == "resnet14"
    assert before["uptime_s"] >= 0

    ok_url = (
        f"{live_server}/stvg?video=clip.npy&question=q&start=-1&end=-1"
    )
    urllib.request.urlopen(ok_url, timeout=600).read()
    with pytest.raises(urllib.error.HTTPError):  # escapes the video root
        urllib.request.urlopen(
            f"{live_server}/stvg?video=../nope.npy&question=q", timeout=30
        )
    after = stats()
    assert after["requests_ok"] == before["requests_ok"] + 1
    assert after["requests_failed"] == before["requests_failed"] + 1
    lat = after["latency_ms"]
    assert lat["window"] == after["requests_ok"]
    assert lat["p50"] is not None and lat["p50"] > 0
    assert lat["max"] >= lat["p50"]


def test_path_traversal_rejected(live_server, tmp_path):
    outside = tmp_path / "outside.npy"
    np.save(outside, np.zeros((2, 8, 8, 3), np.uint8))
    for vid in ("../outside.npy", str(outside)):
        q = urllib.parse.quote(vid, safe="")
        try:
            urllib.request.urlopen(
                f"{live_server}/stvg?video={q}&question=x", timeout=60
            )
            code = 200
        except urllib.error.HTTPError as err:
            code = err.code
        assert code == 403, vid


def test_index_escapes_html(live_server, server_obj):
    evil = server_obj.video_root + "/<script>.npy"
    np.save(evil, np.zeros((1, 4, 4, 3), np.uint8))
    try:
        html = urllib.request.urlopen(f"{live_server}/", timeout=30).read().decode()
        assert "<script>" not in html
        assert "&lt;script&gt;" in html
    finally:
        import os

        os.remove(evil)


def test_unknown_path_404(live_server):
    try:
        urllib.request.urlopen(f"{live_server}/nope", timeout=30)
        raised = False
    except urllib.error.HTTPError as err:
        raised = err.code == 404
    assert raised


def test_batched_serving_coalesces_requests(tmp_path):
    """--serve_max_batch 2: two concurrent /stvg requests are served by ONE
    ground_many forward at B=2 (leader-follower coalescing). Deterministic:
    the test holds the inference lock until both requests are enqueued."""
    import time

    rng = np.random.RandomState(1)
    clip = rng.randint(0, 255, (6, 48, 64, 3), dtype=np.uint8)
    np.save(tmp_path / "clip.npy", clip)
    cfg = TubeDETRConfig(
        backbone="resnet14",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=1,
        dim_feedforward=64,
        video_max_len=6,
        video_max_len_train=6,
        stride=2,
        resolution=128,
        max_text_len=8,
        text_vocab_size=128,
        text_hidden_size=32,
        text_layers=1,
        text_heads=4,
        text_ffn=64,
        text_max_positions=40,
        fast=True,
        guided_attn=False,
        sted=True,
        aux_loss=False,
        dropout=0.0,
        output_dir=str(tmp_path / "out"),
        serve_max_batch=2,
    )
    server = Server(cfg, video_root=str(tmp_path))
    batch_sizes = []
    orig = server.pipeline.ground_many

    def spy(reqs, **kw):
        batch_sizes.append(len(reqs))
        return orig(reqs, **kw)

    server.pipeline.ground_many = spy
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"

    results = {}

    def fire(name, question):
        q = urllib.parse.urlencode(
            {"video": "clip.npy", "question": question, "format": "json"}
        )
        body = urllib.request.urlopen(f"{url}/stvg?{q}", timeout=120).read()
        results[name] = json.loads(body)

    with server.lock:  # leader cannot run until we release
        t1 = threading.Thread(target=fire, args=("a", "a red square"))
        t2 = threading.Thread(target=fire, args=("b", "a blue circle"))
        t1.start()
        t2.start()
        deadline = time.time() + 60
        while time.time() < deadline:
            with server._batch_lock:
                if len(server._pending) == 2:
                    break
            time.sleep(0.01)
        else:
            raise AssertionError("requests never enqueued")
    t1.join(timeout=300)
    t2.join(timeout=300)
    httpd.shutdown()

    assert set(results) == {"a", "b"}
    for r in results.values():
        assert len(r["sted"]) == 2
        assert np.asarray(r["boxes"]).shape == (6, 4)
    # ONE coalesced forward handled both requests
    assert batch_sizes == [2], batch_sizes


def test_batched_serving_isolates_poisoned_request(tmp_path):
    """Error isolation under coalescing (VERDICT r2 missing #3): one
    poisoned request (unreadable video) 500s ALONE while its concurrent
    batchmate completes — the reference serves requests independently
    (/root/reference/server_stvg.py:118-270) and batching must not change
    who an error hits. Also checks monotonic artifact names (no slot
    recycling across batches, ADVICE r2)."""
    import os
    import time

    rng = np.random.RandomState(2)
    clip = rng.randint(0, 255, (6, 48, 64, 3), dtype=np.uint8)
    np.save(tmp_path / "clip.npy", clip)
    # poisoned: exists under the root (passes containment) but np.load fails
    (tmp_path / "bad.npy").write_bytes(b"not a numpy file at all")
    cfg = TubeDETRConfig(
        backbone="resnet14",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=1,
        dim_feedforward=64,
        video_max_len=6,
        video_max_len_train=6,
        stride=2,
        resolution=128,
        max_text_len=8,
        text_vocab_size=128,
        text_hidden_size=32,
        text_layers=1,
        text_heads=4,
        text_ffn=64,
        text_max_positions=40,
        fast=True,
        guided_attn=False,
        sted=True,
        aux_loss=False,
        dropout=0.0,
        output_dir=str(tmp_path / "out"),
        serve_max_batch=2,
    )
    server = Server(cfg, video_root=str(tmp_path))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"

    codes, bodies = {}, {}

    def fire(name, video):
        q = urllib.parse.urlencode(
            {"video": video, "question": "a thing", "format": "json"}
        )
        try:
            resp = urllib.request.urlopen(f"{url}/stvg?{q}", timeout=120)
            codes[name], bodies[name] = resp.status, resp.read()
        except urllib.error.HTTPError as err:
            codes[name] = err.code

    with server.lock:  # coalesce deterministically: hold until both queue
        t1 = threading.Thread(target=fire, args=("good", "clip.npy"))
        t2 = threading.Thread(target=fire, args=("bad", "bad.npy"))
        t1.start()
        t2.start()
        deadline = time.time() + 60
        while time.time() < deadline:
            with server._batch_lock:
                if len(server._pending) == 2:
                    break
            time.sleep(0.01)
        else:
            raise AssertionError("requests never enqueued")
    t1.join(timeout=300)
    t2.join(timeout=300)

    assert codes["bad"] == 500  # fails alone
    assert codes["good"] == 200  # innocent batchmate completes
    good = json.loads(bodies["good"])
    assert len(good["boxes"]) == 6

    # a second batch must not recycle the first batch's artifact names
    fire("again", "clip.npy")
    assert codes["again"] == 200
    frames_artifacts = sorted(
        f for f in os.listdir(server.out_dir)
        if f.startswith("tube_frames-r")
    )
    assert len(frames_artifacts) >= 2, frames_artifacts
    assert len(set(frames_artifacts)) == len(frames_artifacts)
    httpd.shutdown()


def _soak_cfg(tmp_path, **over):
    base = dict(
        backbone="resnet14",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=1,
        dim_feedforward=64,
        video_max_len=8,
        video_max_len_train=8,
        stride=2,
        resolution=128,
        max_text_len=8,
        text_vocab_size=128,
        text_hidden_size=32,
        text_layers=1,
        text_heads=4,
        text_ffn=64,
        text_max_positions=40,
        fast=True,
        guided_attn=False,
        sted=True,
        aux_loss=False,
        dropout=0.0,
        output_dir=str(tmp_path / "out"),
    )
    base.update(over)
    return TubeDETRConfig(**base)


def test_serving_soak_concurrent_mixed_requests(tmp_path):
    """Live-server soak under coalescing (VERDICT r3 #6): 18 concurrent
    mixed requests (4 poisoned) across several batch windows. Asserts:

    * per-request isolation: every poisoned request 500s alone, every good
      request 200s with ITS OWN video's payload (frame counts differ per
      clip, so a cross-served response is detectable at the HTTP layer);
    * artifact ids are strictly monotonic across dispatch calls and each
      rendered artifact binds to the request that produced it (clips are
      constant-valued, so the artifact's dominant pixel identifies it);
    * coalescing actually happened (>1 request in at least one forward)
      and every request was dispatched exactly once;
    * no thread leak and no fd leak after the storm + clean shutdown;
    * bounded waits: no client observed anything near WAIT_TIMEOUT_S.

    Behavioral parity bar: the reference serves requests independently
    (/root/reference/server_stvg.py:118-270); coalescing must not change
    any observable outcome.
    """
    import os
    import time

    n_good, n_bad = 14, 4
    # distinct frame count AND constant pixel value per clip = identity
    vals = {}
    for i in range(n_good):
        t_i = 3 + (i % 6)  # 3..8 frames, all <= video_max_len
        v_i = 10 + 13 * i
        clip = np.full((t_i, 48, 64, 3), v_i, dtype=np.uint8)
        np.save(tmp_path / f"clip{i}.npy", clip)
        vals[f"clip{i}.npy"] = (t_i, v_i)
    (tmp_path / "bad.npy").write_bytes(b"this is not a numpy file")

    cfg = _soak_cfg(
        tmp_path, serve_max_batch=4, serve_batch_window_ms=50.0
    )
    server = Server(cfg, video_root=str(tmp_path))
    calls = []  # (requests, tags) per ground_many dispatch
    orig = server.pipeline.ground_many

    def spy(reqs, **kw):
        calls.append((list(reqs), list(kw.get("tags") or [])))
        return orig(reqs, **kw)

    server.pipeline.ground_many = spy
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"

    # warm the executable (one compile) before measuring leak baselines
    q = urllib.parse.urlencode(
        {"video": "clip0.npy", "question": "warm", "format": "json"}
    )
    urllib.request.urlopen(f"{url}/stvg?{q}", timeout=600).read()

    fd_dir = "/proc/self/fd"
    fds_before = len(os.listdir(fd_dir))
    threads_before = threading.active_count()

    codes, payloads, waits = {}, {}, {}

    def fire(name, video, stagger):
        time.sleep(stagger)
        qq = urllib.parse.urlencode(
            {"video": video, "question": f"find {name}", "format": "json"}
        )
        t0 = time.time()
        try:
            resp = urllib.request.urlopen(f"{url}/stvg?{qq}", timeout=600)
            codes[name] = resp.status
            payloads[name] = json.loads(resp.read())
        except urllib.error.HTTPError as err:
            codes[name] = err.code
        waits[name] = time.time() - t0

    jobs = [(f"g{i}", f"clip{i}.npy") for i in range(n_good)]
    jobs += [(f"b{i}", "bad.npy") for i in range(n_bad)]
    # interleave poisoned among good so they share batches
    jobs = jobs[0:3] + jobs[14:15] + jobs[3:7] + jobs[15:16] + \
        jobs[7:10] + jobs[16:17] + jobs[10:14] + jobs[17:18]
    threads = [
        threading.Thread(target=fire, args=(n, v, 0.02 * k))
        for k, (n, v) in enumerate(jobs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=900)
    assert not any(t.is_alive() for t in threads), "client thread hung"

    # --- per-request isolation + response-to-request binding ------------
    for i in range(n_bad):
        assert codes[f"b{i}"] == 500, (i, codes)
    for i in range(n_good):
        name = f"g{i}"
        assert codes[name] == 200, (name, codes)
        t_i, _ = vals[f"clip{i}.npy"]
        assert len(payloads[name]["boxes"]) == t_i, (
            f"{name} got a response for a different video: "
            f"{len(payloads[name]['boxes'])} boxes != {t_i} frames"
        )

    # --- dispatch accounting: everyone served once, coalescing happened --
    soak_calls = calls[1:]  # drop the warmup
    dispatched = sum(len(reqs) for reqs, _ in soak_calls)
    assert dispatched == len(jobs), (dispatched, len(jobs))
    assert len(soak_calls) > 1, "everything landed in one batch?"
    assert any(len(reqs) > 1 for reqs, _ in soak_calls), (
        "no coalescing happened in the whole soak"
    )

    # --- artifact ids: strictly monotonic, never recycled, bound to their
    # originating request (constant-valued clips -> dominant pixel) -------
    all_tags = [t for _, tags in calls for t in tags]
    seqs = [int(t.split("-r")[1]) for t in all_tags]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs), seqs
    checked = 0
    for reqs, tags in soak_calls:
        for (vp, _cap, _s, _e), tag in zip(reqs, tags):
            base = os.path.basename(vp)
            if base not in vals:
                continue  # poisoned: filtered before the forward
            art = os.path.join(server.out_dir, f"tube_frames{tag}.npy")
            if not os.path.exists(art):
                continue  # beyond KEEP_ARTIFACTS cleanup
            t_i, v_i = vals[base]
            arr = np.load(art)
            assert arr.shape[0] == t_i, (tag, arr.shape, t_i)
            counts = np.bincount(arr.reshape(-1), minlength=256)
            assert int(counts.argmax()) == v_i, (
                f"artifact {tag} content belongs to another request"
            )
            checked += 1
    assert checked >= n_good - n_bad, checked

    # --- bounded waits: far from the 1800s dispatcher timeout -----------
    p99 = sorted(waits.values())[int(0.99 * (len(waits) - 1))]
    assert p99 < Server.WAIT_TIMEOUT_S / 4, waits

    # --- clean shutdown, no thread/fd leak -------------------------------
    httpd.shutdown()
    deadline = time.time() + 30
    while time.time() < deadline:
        if (
            threading.active_count() <= threads_before
            and len(os.listdir(fd_dir)) <= fds_before + 4
        ):
            break
        time.sleep(0.2)
    assert threading.active_count() <= threads_before, (
        threading.enumerate()
    )
    assert len(os.listdir(fd_dir)) <= fds_before + 4


def test_graceful_drain(tmp_path):
    """SIGTERM semantics (Server.drain): new requests are rejected with
    503 and /healthz flips to 503 "draining" (load-balancer ejection),
    while an already-admitted request runs to completion; drain() returns
    True only once the server is quiescent, and times out honestly (False)
    while work is still wedged in flight."""
    import time

    clip = np.full((4, 48, 64, 3), 9, dtype=np.uint8)
    np.save(tmp_path / "clip.npy", clip)
    cfg = _soak_cfg(tmp_path, serve_max_batch=2)
    server = Server(cfg, video_root=str(tmp_path))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"
    q = urllib.parse.urlencode(
        {"video": "clip.npy", "question": "x", "format": "json"}
    )
    # warm the executable so the in-flight request below is fast once freed
    urllib.request.urlopen(f"{url}/stvg?{q}", timeout=600).read()

    codes = {}

    def fire(name):
        try:
            resp = urllib.request.urlopen(f"{url}/stvg?{q}", timeout=120)
            codes[name] = resp.status
        except urllib.error.HTTPError as err:
            codes[name] = err.code

    with server.lock:  # wedge the dispatcher: request admitted, not served
        t_infl = threading.Thread(target=fire, args=("inflight",))
        t_infl.start()
        deadline = time.time() + 30
        while time.time() < deadline:
            with server._batch_lock:
                if server._inflight == 1:
                    break
            time.sleep(0.01)
        else:
            raise AssertionError("request never admitted")

        # drain cannot complete while the admitted request is in flight
        assert server.drain(timeout=0.3) is False

        # new work is rejected with 503; healthz reports draining (503)
        fire("rejected")
        assert codes["rejected"] == 503
        try:
            urllib.request.urlopen(f"{url}/healthz", timeout=30)
            hcode = 200
        except urllib.error.HTTPError as err:
            hcode = err.code
            assert json.loads(err.read()) == {"status": "draining"}
        assert hcode == 503

        # a second drain waiter, now with a generous timeout, completes
        # once the wedge lifts and the in-flight request finishes
        done = {}

        def wait_drain():
            done["ok"] = server.drain(timeout=60)

        t_drain = threading.Thread(target=wait_drain)
        t_drain.start()
        time.sleep(0.2)
        assert t_drain.is_alive()  # still waiting on the in-flight request
    t_infl.join(timeout=300)
    t_drain.join(timeout=300)
    assert codes["inflight"] == 200  # admitted work ran to completion
    assert done["ok"] is True
    assert server._inflight == 0
    httpd.shutdown()


def test_wedged_dispatcher_returns_503_within_timeout(tmp_path):
    """WAIT_TIMEOUT_S is honored: when the dispatcher cannot make progress
    (inference lock held — a stand-in for a wedged backend), a waiting
    client gets a 503 after the bounded wait instead of hanging forever."""
    import time

    clip = np.full((4, 48, 64, 3), 7, dtype=np.uint8)
    np.save(tmp_path / "clip.npy", clip)
    cfg = _soak_cfg(tmp_path, serve_max_batch=2)
    server = Server(cfg, video_root=str(tmp_path))
    server.WAIT_TIMEOUT_S = 2.0  # instance override, class default untouched
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"
    q = urllib.parse.urlencode(
        {"video": "clip.npy", "question": "x", "format": "json"}
    )
    with server.lock:  # dispatcher can take items but never run them
        t0 = time.time()
        try:
            urllib.request.urlopen(f"{url}/stvg?{q}", timeout=60)
            code = 200
        except urllib.error.HTTPError as err:
            code = err.code
        elapsed = time.time() - t0
    assert code == 503, code
    assert elapsed < 30, elapsed
    httpd.shutdown()
