"""Multimodal plumbing tests: media-ref collection from extracted
spans, payload synth, stubbed decode, resize layout."""

import pyarrow as pa
import pytest

from gumbo_pp_ray.stages.media import (
    DecodeMedia, ResizeStub, collect_media_refs, media_type_of,
    synth_payloads,
)

SPANS_TYPE = pa.list_(pa.struct([
    ("kind", pa.string()), ("text", pa.string()),
    ("media_ref", pa.string()), ("offset", pa.int32()),
]))


def spans_tbl():
    return pa.table({
        "doc_id": pa.array(["d1", "d2"], pa.string()),
        "spans": pa.array([
            [{"kind": "text", "text": "x", "media_ref": "", "offset": 0},
             {"kind": "media", "text": "", "media_ref": "img://a/1.jpg",
              "offset": 1},
             {"kind": "media", "text": "", "media_ref": "vid://a/2.mp4",
              "offset": 2}],
            [{"kind": "text", "text": "y", "media_ref": "", "offset": 0}],
        ], SPANS_TYPE),
    })


def test_media_type_of():
    assert media_type_of("img://x/y.jpg") == "image"
    assert media_type_of("vid://x.mp4") == "video"
    assert media_type_of("aud://x.wav") == "audio"
    assert media_type_of("https://x") == "unknown"
    assert media_type_of("") == "unknown"


def test_collect_media_refs():
    out = collect_media_refs(spans_tbl())
    assert out.to_pylist() == [
        {"doc_id": "d1", "media_ref": "img://a/1.jpg",
         "media_type": "image"},
        {"doc_id": "d1", "media_ref": "vid://a/2.mp4",
         "media_type": "video"},
    ]


def test_decode_fake_deterministic():
    t = synth_payloads(collect_media_refs(spans_tbl()))
    dec = DecodeMedia(decoder="fake", feat_dim=8)
    a = dec(t).to_pylist()
    b = dec(t).to_pylist()
    assert a == b
    assert a[0]["width"] >= 64 and a[0]["n_frames"] == 1     # image
    assert a[1]["n_frames"] >= 1                             # video
    assert len(a[0]["features"]) == 8
    assert all(0.0 <= f <= 1.0 for f in a[0]["features"])


def test_decode_real_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        DecodeMedia(decoder="real")
    with pytest.raises(ValueError):
        DecodeMedia(decoder="nope")


def test_resize_stub_layout():
    t = DecodeMedia(decoder="fake")(
        synth_payloads(collect_media_refs(spans_tbl())))
    out = ResizeStub(target=(224, 224), max_frames=4)(t)
    rows = out.to_pylist()
    assert rows[0]["out_width"] == 224
    assert all(r["out_frames"] <= 4 for r in rows)


def test_media_pipeline_over_ray(ray_session):
    import ray.data
    ds = ray.data.from_arrow(spans_tbl())
    out = (ds.map_batches(collect_media_refs, batch_format="pyarrow")
             .map_batches(synth_payloads, batch_format="pyarrow")
             .map_batches(DecodeMedia,
                          fn_constructor_kwargs={"decoder": "fake"},
                          batch_format="pyarrow", batch_size=16,
                          concurrency=2)
             .map_batches(ResizeStub, batch_format="pyarrow",
                          batch_size=16, concurrency=2))
    rows = out.take_all()
    assert len(rows) == 2
    assert {r["media_type"] for r in rows} == {"image", "video"}


def test_decode_media_auto_probe_fallback():
    """No codec libs in this container: auto → header decoder (real
    geometry, no pixels), real → raises, and a monkeypatched probe
    exercises the real path selection."""
    import pytest

    from gumbo_pp_ray.stages import media as m

    d = m.DecodeMedia(decoder="auto")
    assert d.mode == "headers"
    assert m.DecodeMedia(decoder="fake").mode == "fake"
    with pytest.raises(NotImplementedError):
        m.DecodeMedia(decoder="real")
    with pytest.raises(ValueError):
        m.DecodeMedia(decoder="bogus")


def test_decode_media_real_path_with_fake_codec(monkeypatch):
    """Simulate an importable codec: the real decode path must drive
    it (open → size/convert/resize) and emit decoder='real' rows."""
    import numpy as np
    import pyarrow as pa

    from gumbo_pp_ray.stages import media as m

    class FakeImg:
        size = (320, 200)
        n_frames = 1
        def convert(self, mode):
            return self
        def resize(self, wh):
            self._wh = wh
            return self
        def tobytes(self):
            return bytes(range(self._wh[0] * self._wh[1]))

    class FakeCodec:
        @staticmethod
        def open(fp):
            return FakeImg()

    monkeypatch.setattr(m, "probe_image_codec", lambda: FakeCodec)
    d = m.DecodeMedia(decoder="auto", feat_dim=16)
    assert d.mode == "real"
    t = pa.table({
        "doc_id": ["a"], "media_ref": ["img://x.jpg"],
        "media_type": ["image"], "payload": [b"\x89PNG fake"],
    })
    out = d(t)
    assert out.column("width").to_pylist() == [320]
    assert out.column("height").to_pylist() == [200]
    assert out.column("decoder").to_pylist() == ["real"]
    feats = out.column("features").to_pylist()[0]
    assert len(feats) == 16 and max(feats) <= 1.0


def test_decode_media_real_path_bad_payload_sentinel(monkeypatch):
    from gumbo_pp_ray.stages import media as m

    class Exploding:
        @staticmethod
        def open(fp):
            raise OSError("cannot identify image")

    monkeypatch.setattr(m, "probe_image_codec", lambda: Exploding)
    import pyarrow as pa
    d = m.DecodeMedia(decoder="auto")
    out = d(pa.table({"doc_id": ["a"], "media_ref": ["img://x"],
                      "media_type": ["image"], "payload": [b"junk"]}))
    assert out.column("width").to_pylist() == [-1]
    assert out.column("n_frames").to_pylist() == [0]


@pytest.mark.realcodec
def test_decode_media_real_codec_roundtrip():
    """Real-codec CI hook: runs the ACTUAL Pillow decode path the
    moment a wheel is available (skipped in codec-less containers —
    the fake-codec test above proves the same seam)."""
    import io
    from gumbo_pp_ray.stages.media import DecodeMedia, probe_image_codec

    Image = probe_image_codec()
    if Image is None:
        pytest.skip("Pillow not installed")
    img = Image.new("RGB", (32, 17), (200, 10, 10))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    dec = DecodeMedia(decoder="real", feat_dim=16)
    out = dec(pa.table({
        "doc_id": ["d1"], "media_ref": ["img://x.png"],
        "media_type": ["image"], "payload": [buf.getvalue()],
    }))
    assert out.column("width").to_pylist() == [32]
    assert out.column("height").to_pylist() == [17]
    assert out.column("decoder").to_pylist() == ["real"]
    assert any(v > 0 for v in out.column("features")[0].as_py())


def test_synth_image_bytes_real_containers():
    """The synthesized payloads are honest container headers: the
    header decoder parses back exactly the generator's geometry for
    all three formats."""
    from gumbo_pp_ray.stages import media as m

    for doc_id in (0, 1, 2, 59, 240, 481, 997):
        payload = m.synth_image_bytes(doc_id)
        fmt, w, h = m.parse_image_header(payload)
        assert fmt == ("png", "gif", "jpeg")[doc_id % 3]
        assert w == 16 + (doc_id * 3) % 240
        assert h == 16 + (doc_id * 7) % 240


def test_parse_image_header_rejects_junk():
    from gumbo_pp_ray.stages import media as m

    assert m.parse_image_header(b"") is None
    assert m.parse_image_header(b"\x00" * 64) is None
    assert m.parse_image_header(b"GIF8") is None            # truncated
    assert m.parse_image_header(b"\x89PNG\r\n\x1a\n1234IDAT") is None
    # JPEG SOI but no SOF marker before EOI
    assert m.parse_image_header(b"\xff\xd8\xff\xd9\x00\x00") is None


def test_parse_image_header_jpeg_skips_segments():
    """SOF detection must scan past APPn/COM segments of arbitrary
    length (real-world JPEGs lead with EXIF/comment blocks)."""
    import struct

    from gumbo_pp_ray.stages import media as m

    comment = b"\xff\xfe" + struct.pack(">H", 2 + 10) + b"x" * 10
    sof = (b"\xff\xc2" + struct.pack(">H", 11)
           + struct.pack(">BHH", 8, 33, 77) + b"\x01\x11\x00")
    payload = b"\xff\xd8" + comment + sof + b"\xff\xd9"
    assert m.parse_image_header(payload) == ("jpeg", 77, 33)


def test_decode_headers_mode_batch():
    import pyarrow as pa

    from gumbo_pp_ray.stages import media as m

    batch = pa.table({
        "doc_id": pa.array(["3", "4"], pa.string()),
        "media_ref": pa.array(["img://doc/3.jpg", "img://doc/4.jpg"]),
        "media_type": pa.array(["image", "image"]),
    })
    with_payload = m.synth_image_payloads(batch)
    out = m.DecodeMedia(decoder="headers")(with_payload)
    assert out.column("decoder").to_pylist() == ["headers"] * 2
    assert out.column("format").to_pylist() == ["png", "gif"]
    assert out.column("width").to_pylist() == [16 + 9, 16 + 12]
    assert out.column("n_frames").to_pylist() == [1, 1]
