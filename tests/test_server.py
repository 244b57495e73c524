"""HTTP serving tier: micro-batching, endpoints, error handling.

Spins a real server (random port, tiny model) in a thread and talks to it
over the socket -- the same surface a production client uses. The reference
has no serving path; see infer/server.py.
"""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from fastspeech2_tpu.config import Config, ModelConfig
from fastspeech2_tpu.infer.server import Batcher, serve
from fastspeech2_tpu.infer.synthesize import Synthesizer
from fastspeech2_tpu.models.fastspeech2 import FastSpeech2


@pytest.fixture(scope="module")
def server():
    cfg = Config(model=ModelConfig(
        adim=32, ddim=32, aheads=2, elayers=1, dlayers=1, eunits=64,
        dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_chans=16))
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    import jax.numpy as jnp

    params["duration_predictor"]["out"]["b"] = jnp.full_like(
        params["duration_predictor"]["out"]["b"], 1.0)
    synth = Synthesizer(model, params, state)
    ready = threading.Event()
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    t = threading.Thread(
        target=serve, args=(synth, cfg),
        kwargs=dict(host="127.0.0.1", port=port, max_wait_ms=20.0,
                    ready_event=ready),
        daemon=True)
    t.start()
    assert ready.wait(timeout=30)
    yield f"http://127.0.0.1:{port}"


def _post(url, payload):
    req = urllib.request.Request(
        url + "/synthesize", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        ct = r.headers.get("Content-Type", "")
        body = r.read()
    return ct, body


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        obj = json.loads(r.read())
    assert obj["status"] == "ok"


def test_synthesize_phonemes_mel(server):
    ct, body = _post(server, {"phonemes": "HH AH0 L OW1 W ER1 L D"})
    obj = json.loads(body)
    assert "application/json" in ct
    mel = np.asarray(obj["mel"], np.float32)
    assert mel.ndim == 2 and mel.shape[1] == 80 and obj["frames"] == len(mel)


def test_synthesize_text_wav(server):
    ct, body = _post(server, {"text": "hello world", "format": "wav"})
    assert ct == "audio/wav"
    assert body[:4] == b"RIFF" and len(body) > 44


def test_concurrent_requests_batch(server):
    results = [None] * 6

    def go(i):
        ct, body = _post(server, {"phonemes": "HH AH0 L OW1", "alpha": 1.0})
        results[i] = json.loads(body)["frames"]

    threads = [threading.Thread(target=go, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(isinstance(r, int) and r >= 0 for r in results)
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        stats = json.loads(r.read())
    # at least one multi-request batch formed (6 requests, <= stats noise
    # from other tests) -- batches < requests proves coalescing happened
    assert stats["batches"] < stats["requests"]


def test_stream_multi_sentence_wav(server):
    """POST /stream returns chunked streaming WAV whose PCM grows with the
    sentence count (each sentence's audio streams as it finishes)."""
    def stream(text):
        req = urllib.request.Request(
            server + "/stream", data=json.dumps({"text": text}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers.get("Content-Type") == "audio/wav"
            assert r.headers.get("Transfer-Encoding") == "chunked"
            return r.read()  # urllib decodes the chunked framing

    one = stream("hello world.")
    three = stream("hello world. good morning there. the stream keeps going.")
    for body in (one, three):
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        # streaming header: unknown RIFF/data sizes
        assert body[4:8] == b"\xff\xff\xff\xff"
        assert len(body) > 44
    assert len(three) > len(one)


def test_stream_bad_input(server):
    # unphonemizable text, unknown phoneme symbols (client 400, not a 500),
    # and a sentence-count flood all reject up front
    for payload in ({"text": "..!?"}, {"phonemes": "HH QQ9"},
                    {"text": "a." * 300}):
        req = urllib.request.Request(
            server + "/stream", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400, payload


def test_negative_content_length_400(server):
    """A negative Content-Length must 400 immediately: rfile.read(-1) would
    read to EOF and pin the handler thread forever (ADVICE r2)."""
    import http.client

    host, port = server.removeprefix("http://").split(":")
    c = http.client.HTTPConnection(host, int(port), timeout=30)
    c.putrequest("POST", "/synthesize")
    c.putheader("Content-Length", "-5")
    c.endheaders()
    r = c.getresponse()
    assert r.status == 400
    r.read()
    c.close()


def test_oversized_body_413(server):
    big = json.dumps({"text": "x" * (2 << 20)}).encode()
    req = urllib.request.Request(
        server + "/synthesize", data=big,
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 413


def test_bad_requests(server):
    # non-object JSON bodies and non-numeric alpha must 400, not drop the
    # connection (the handler catches TypeError/AttributeError too)
    for payload, want in (({}, 400), ({"format": "midi", "text": "x"}, 400),
                          (123, 400), ([1, 2], 400),
                          ({"text": "x", "alpha": None}, 400),
                          ({"text": "x", "alpha": [1]}, 400)):
        req = urllib.request.Request(
            server + "/synthesize", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == want
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server + "/nope", timeout=30)
    assert e.value.code == 404


def test_batcher_direct():
    """Batcher coalesces queued requests into one forward call."""
    calls = []

    class FakeSynth:
        def mel_from_token_batch_async(self, seqs, alpha=1.0):
            calls.append(len(seqs))

            def finish():
                lens = np.asarray([3] * len(seqs))
                mel = np.zeros((len(seqs), 5, 80), np.float32)
                return mel, lens, np.zeros(len(seqs), bool)

            return finish

    b = Batcher(FakeSynth(), max_batch=8, max_wait_ms=50.0)
    reqs = [b.submit(np.asarray([1, 2, 3], np.int32)) for _ in range(5)]
    for r in reqs:
        assert r.done.wait(timeout=10)
        assert r.mel.shape == (3, 80)
    b.close()
    assert sum(calls) == 5 and len(calls) <= 2  # coalesced, not 5 x B=1


def test_serving_batch_pow2_padding_and_warmup():
    """Micro-batches pad to the next power of two so a varying request count
    reuses one traced shape per pow2 bucket (not one per B), and warmup()
    pre-populates the cache so the first real call doesn't trace. Checked on
    the heuristic single-program path; the demand-sized twin below covers
    the encode/decode caches."""
    cfg = Config(model=ModelConfig(
        adim=32, ddim=32, aheads=2, elayers=1, dlayers=1, eunits=64,
        dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_chans=16))
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    synth = Synthesizer(model, params, state, demand_sized=False)

    def seqs(b):
        return [np.ones((8,), np.int32)] * b

    mel, lens = synth.mel_from_token_batch(seqs(3))
    assert mel.shape[0] == 3 and lens.shape == (3,)  # pad rows sliced away
    synth.mel_from_token_batch(seqs(4))
    (fn,) = synth._jitted.values()
    assert fn._cache_size() == 1  # B=3 and B=4 share the B_pad=4 trace
    synth.mel_from_token_batch(seqs(5))
    assert fn._cache_size() == 2  # B=5 -> B_pad=8: one new trace

    synth2 = Synthesizer(model, params, state, demand_sized=False)
    assert synth2.warmup(batch_sizes=(1,), token_lens=(8,)) == 1
    (fn2,) = synth2._jitted.values()
    before = fn2._cache_size()
    synth2.mel_from_token_batch(seqs(1))  # same shape: no new trace
    assert fn2._cache_size() == before

    # warmup(1, max_batch) covers EVERY pow2 bucket in between, so
    # intermediate request counts (B=3 -> B_pad=4) also skip the trace
    synth3 = Synthesizer(model, params, state, demand_sized=False)
    assert synth3.warmup(batch_sizes=(1, 8), token_lens=(8,)) == 4  # 1,2,4,8
    (fn3,) = synth3._jitted.values()
    before = fn3._cache_size()
    for b in (2, 3, 5, 7):  # every intermediate bucket already traced
        synth3.mel_from_token_batch(seqs(b))
    assert fn3._cache_size() == before


def test_demand_sized_pow2_padding_and_warmup():
    """The demand-sized (default) path keeps the same jit-cache discipline:
    pow2 B-padding shares encode traces across request counts, and warmup
    pre-compiles every 256-frame decode rung up to the heuristic ceiling so
    no live request ever cold-compiles in the delivery thread."""
    cfg = Config(model=ModelConfig(
        adim=32, ddim=32, aheads=2, elayers=1, dlayers=1, eunits=64,
        dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_chans=16))
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    synth = Synthesizer(model, params, state, demand_sized=True)

    def seqs(b):
        return [np.ones((8,), np.int32)] * b

    mel, lens = synth.mel_from_token_batch(seqs(3))
    assert mel.shape[0] == 3 and lens.shape == (3,)
    synth.mel_from_token_batch(seqs(4))
    (enc,) = synth._jitted_enc.values()
    assert enc._cache_size() == 1  # B=3 and B=4 share the B_pad=4 trace
    assert not synth._jitted  # single-program path never engaged
    synth.mel_from_token_batch(seqs(5))
    assert enc._cache_size() == 2  # B=5 -> B_pad=8: one new trace

    # warmup: 1 full call + one dec compile per 256-rung up to the
    # frames_per_token ceiling (t_pad=32 x 12 = 384 -> rungs 256, 512)
    synth2 = Synthesizer(model, params, state, demand_sized=True)
    assert synth2.warmup(batch_sizes=(1,), token_lens=(8,)) == 3
    assert set(synth2._jitted_dec) >= {(32, 256), (32, 512)}
    # a live request whose demand lands on a warmed rung traces nothing new
    dec = synth2._jitted_dec[(32, 256)]
    before = dec._cache_size()
    synth2.mel_from_token_batch(seqs(1))
    assert dec._cache_size() == before


def test_synthesizer_mesh_matches_single_device():
    """Data-parallel inference over the 8-device CPU mesh == single device,
    including a batch size that doesn't divide the mesh."""
    from fastspeech2_tpu.train.step import make_mesh

    cfg = Config(model=ModelConfig(
        adim=32, ddim=32, aheads=2, elayers=1, dlayers=1, eunits=64,
        dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_chans=16))
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    import jax.numpy as jnp

    params["duration_predictor"]["out"]["b"] = jnp.full_like(
        params["duration_predictor"]["out"]["b"], 1.0)

    g = np.random.default_rng(0)
    seqs = [np.asarray(g.integers(1, 68, n), np.int32) for n in (5, 9, 7)]

    plain = Synthesizer(model, params, state)
    mesh = make_mesh(len(jax.devices()))
    sharded = Synthesizer(model, params, state, mesh=mesh)

    mel_a, len_a = plain.mel_from_token_batch(seqs)
    mel_b, len_b = sharded.mel_from_token_batch(seqs)
    assert mel_b.shape[0] == 3 and len_b.shape == (3,)
    np.testing.assert_array_equal(len_a, len_b)
    np.testing.assert_allclose(mel_a, mel_b, rtol=2e-5, atol=2e-5)


def test_serve_with_melgan_vocoder(tmp_path):
    """wav responses through a neural vocoder (serve --vocoder): a tiny real
    seungwonpark-format checkpoint loads via load_melgan and the served wav
    has vocoder length semantics (L * hop samples, 16-bit PCM)."""
    import socket
    import struct

    import torch

    import test_vocoder as tv
    from fastspeech2_tpu.vocoder.melgan import MelGANConfig, load_melgan

    torch.manual_seed(11)
    gen_t = tv._torch_seungwonpark_generator(base=16)
    ckpt = tmp_path / "melgan16.pt"
    torch.save({"model_g": {f"generator.{k}": v
                            for k, v in gen_t.state_dict().items()}}, ckpt)
    vocoder = load_melgan(str(ckpt), MelGANConfig(base_channels=16),
                          batch_frames=16)

    cfg = Config(model=ModelConfig(
        adim=32, ddim=32, aheads=2, elayers=1, dlayers=1, eunits=64,
        dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_chans=16))
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    import jax.numpy as jnp

    params["duration_predictor"]["out"]["b"] = jnp.full_like(
        params["duration_predictor"]["out"]["b"], 1.0)
    synth = Synthesizer(model, params, state)

    ready = threading.Event()
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    threading.Thread(
        target=serve, args=(synth, cfg),
        kwargs=dict(host="127.0.0.1", port=port, max_wait_ms=20.0,
                    ready_event=ready, vocoder=vocoder),
        daemon=True).start()
    assert ready.wait(timeout=30)

    ct, body = _post(f"http://127.0.0.1:{port}", {
        "phonemes": "HH AH0 L OW1 W ER1 L D", "format": "wav"})
    assert ct == "audio/wav" and body[:4] == b"RIFF"
    n_samples = struct.unpack("<I", body[40:44])[0] // 2
    assert n_samples > 0 and n_samples % 256 == 0  # vocoder: L * hop samples


def test_fused_tts_matches_separate_path():
    """wav_from_token_batch (model+vocoder in ONE device call) == running
    mel inference, floor-masking the padded frames, and vocoding separately."""
    import jax.numpy as jnp
    import math

    from fastspeech2_tpu.vocoder.melgan import (MelGANConfig, MelGANGenerator,
                                                init_melgan)

    cfg = Config(model=ModelConfig(
        adim=32, ddim=32, aheads=2, elayers=1, dlayers=1, eunits=64,
        dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_chans=16))
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    params["duration_predictor"]["out"]["b"] = jnp.full_like(
        params["duration_predictor"]["out"]["b"], 1.0)

    vcfg = MelGANConfig(base_channels=16)
    gen = MelGANGenerator(vcfg)
    vparams = init_melgan(jax.random.PRNGKey(1), vcfg)

    g = np.random.default_rng(0)
    seqs = [np.asarray(g.integers(1, 68, n), np.int32) for n in (5, 9)]

    synth = Synthesizer(model, params, state)
    synth.attach_vocoder(gen, vparams)
    mel_f, wav_f, wav_lens = synth.wav_from_token_batch(seqs)
    assert wav_f.dtype == np.int16  # PCM conversion happens on device
    assert wav_f.shape[1] == mel_f.shape[1] * vcfg.hop_length
    assert np.all(wav_lens % vcfg.hop_length == 0)

    mel_s, out_lens = synth.mel_from_token_batch(seqs)
    np.testing.assert_allclose(mel_f, mel_s, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(wav_lens, out_lens * vcfg.hop_length)
    L = mel_s.shape[1]
    valid = np.arange(L)[None, :, None] < out_lens[:, None, None]
    mel_m = np.where(valid, mel_s, math.log(1e-5)).astype(np.float32)
    wav_s = np.asarray(gen(vparams, jnp.asarray(mel_m)))
    wav_s16 = np.round(np.clip(wav_s, -1, 1) * 32767.0).astype(np.int16)
    # +-1 LSB: float noise at the int16 rounding knife-edge
    np.testing.assert_allclose(wav_f.astype(np.int32),
                               wav_s16.astype(np.int32), atol=1)

    # fused path honors the data-parallel mesh: batch pads to the mesh
    # multiple (B=2 on 8 devices), results match the unsharded fused call
    from fastspeech2_tpu.train.step import make_mesh

    sharded = Synthesizer(model, params, state,
                          mesh=make_mesh(len(jax.devices())))
    sharded.attach_vocoder(gen, vparams)
    mel_m2, wav_m2, lens_m2 = sharded.wav_from_token_batch(seqs)
    assert mel_m2.shape[0] == len(seqs) and wav_m2.shape[0] == len(seqs)
    np.testing.assert_array_equal(lens_m2, wav_lens)
    np.testing.assert_allclose(mel_m2, mel_f, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(wav_m2.astype(np.int32),
                               wav_f.astype(np.int32), atol=1)


def test_serve_fused_tts(tmp_path):
    """Server with an attached (fused) vocoder: wav responses come from the
    single-device-call path, mel responses still work."""
    import socket
    import struct

    import jax.numpy as jnp

    from fastspeech2_tpu.vocoder.melgan import (MelGANConfig, MelGANGenerator,
                                                init_melgan)

    cfg = Config(model=ModelConfig(
        adim=32, ddim=32, aheads=2, elayers=1, dlayers=1, eunits=64,
        dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_chans=16))
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    params["duration_predictor"]["out"]["b"] = jnp.full_like(
        params["duration_predictor"]["out"]["b"], 1.0)
    synth = Synthesizer(model, params, state)
    vcfg = MelGANConfig(base_channels=16)
    synth.attach_vocoder(MelGANGenerator(vcfg),
                         init_melgan(jax.random.PRNGKey(1), vcfg))

    ready = threading.Event()
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    threading.Thread(
        target=serve, args=(synth, cfg),
        kwargs=dict(host="127.0.0.1", port=port, max_wait_ms=20.0,
                    ready_event=ready),
        daemon=True).start()
    assert ready.wait(timeout=30)

    url = f"http://127.0.0.1:{port}"
    ct, body = _post(url, {"phonemes": "HH AH0 L OW1 W ER1 L D",
                           "format": "wav"})
    assert ct == "audio/wav" and body[:4] == b"RIFF"
    n_samples = struct.unpack("<I", body[40:44])[0] // 2
    assert n_samples > 0 and n_samples % 256 == 0

    ct, body = _post(url, {"phonemes": "HH AH0 L OW1", "format": "mel"})
    obj = json.loads(body)
    mel = np.asarray(obj["mel"], np.float32)
    assert mel.ndim == 2 and mel.shape[1] == 80 and obj["frames"] == len(mel)


def test_truncated_response_is_marked(server):
    """A request capped by the synthesizer's max_frames frame buffer comes
    back flagged (JSON "truncated": true / wav X-Truncated header), never
    silently shortened (VERDICT r3 weak #5)."""
    ph = " ".join(["HH AH0 L OW1 W ER1 L D pau"] * 20)  # 160 tokens
    ct, body = _post(server, {"phonemes": ph, "alpha": 10.0})
    obj = json.loads(body)
    assert obj.get("truncated") is True
    assert obj["frames"] == len(obj["mel"])
    # an uncapped request carries no flag
    ct, body = _post(server, {"phonemes": "HH AH0 L OW1"})
    assert "truncated" not in json.loads(body)
    # healthz counts capped requests
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["truncated"] >= 1


def test_fused_wav_path_saturation_rebucket_and_truncation_flag():
    """The fused text->wav path re-buckets on frame-buffer saturation and
    flags max_frames-capped rows, mirroring the mel path (VERDICT r3 weak
    #5) -- the wav buffer grows with the frame buffer, so no audio is
    silently dropped below the cap."""
    import jax.numpy as jnp

    from fastspeech2_tpu.vocoder.melgan import (MelGANConfig, MelGANGenerator,
                                                init_melgan)

    cfg = Config(model=ModelConfig(
        adim=32, ddim=32, aheads=2, elayers=1, dlayers=1, eunits=64,
        dunits=64, postnet_layers=2, postnet_chans=16,
        duration_predictor_chans=16))
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    # ~11 frames/token >> frames_per_token=4: first bucket saturates
    params["duration_predictor"]["out"]["b"] = jnp.full_like(
        params["duration_predictor"]["out"]["b"], 2.5)
    vcfg = MelGANConfig(base_channels=16)
    gen = MelGANGenerator(vcfg)
    vparams = init_melgan(jax.random.PRNGKey(1), vcfg)

    synth = Synthesizer(model, params, state, frames_per_token=4,
                        token_multiple=32, max_frames=2048)
    synth.attach_vocoder(gen, vparams)
    tokens = np.asarray(list(range(1, 33)), np.int32)
    mel, wav, wav_lens, trunc = synth.wav_from_token_batch(
        [tokens], return_truncated=True)
    n = int(wav_lens[0]) // vcfg.hop_length
    assert n > 256 and not trunc[0]  # outgrew the 256-frame first bucket
    assert wav.shape[1] == mel.shape[1] * vcfg.hop_length >= n * vcfg.hop_length
    assert np.any(wav[0, 256 * vcfg.hop_length : n * vcfg.hop_length] != 0)

    # at the cap: capped AND flagged
    synth2 = Synthesizer(model, params, state, frames_per_token=4,
                         token_multiple=32, max_frames=256)
    synth2.attach_vocoder(gen, vparams)
    mel2, wav2, lens2, trunc2 = synth2.wav_from_token_batch(
        [tokens], return_truncated=True)
    assert int(lens2[0]) == 256 * vcfg.hop_length and trunc2[0]
