"""Extraction byte-identity + schema evolution rules."""

import pyarrow as pa
import pytest

from chomper_ray.functions.extract import extract_text, extract_text_column
from chomper_ray.state import schema as sm


class TestExtract:
    def test_strips_tags_scripts_entities(self):
        html = (b"<html><head><title>T</title><style>x{}</style>"
                b"<script>var a=1;</script></head>"
                b"<body><h1>Hello</h1><p>A &amp; B</p><!-- c --></body></html>")
        assert extract_text(html) == "T\nHello\nA & B"

    def test_none_stays_none(self):
        assert extract_text(None) is None

    def test_invalid_utf8_never_raises(self):
        assert isinstance(extract_text(b"<p>\xff\xfe ok</p>"), str)

    def test_batch_path_byte_identical_to_row_path(self):
        # the invariant: one shared pure function (BASELINE.json input_hint)
        from chomper_ray.sources.events import _make_html

        htmls = [_make_html(f"https://x.com/p/{i}", i, 12345) for i in range(50)]
        batch = extract_text_column(htmls)
        rows = [extract_text(h) for h in htmls]
        assert all(b.encode() == r.encode() for b, r in zip(batch, rows))

    def test_optimized_kernel_matches_naive_spec(self):
        """The shipped kernel skips no-op whitespace rewrites and fuses
        the script/style/comment scans; this pins it byte-identical to
        the straightforward one-pattern-per-step spec it replaced, on
        generator pages, adversarial fragments, and random byte soup."""
        import re

        import numpy as np

        from chomper_ray.sources.events import _make_html

        SS = re.compile(rb"<(script|style)\b[^>]*>.*?</\1\s*>",
                        re.IGNORECASE | re.DOTALL)
        CMT = re.compile(rb"<!--.*?-->", re.DOTALL)
        TAG = re.compile(rb"<[^>]+>")
        WS = re.compile(rb"[ \t\r\f\v]+")
        NL = re.compile(rb"\n\s*\n+")
        ENTS = [(b"&nbsp;", b" "), (b"&amp;", b"&"), (b"&lt;", b"<"),
                (b"&gt;", b">"), (b"&quot;", b'"'), (b"&#39;", b"'")]

        def naive(html):
            b = CMT.sub(b" ", SS.sub(b" ", html))
            b = TAG.sub(b"\n", b)
            for e, r in ENTS:
                b = b.replace(e, r)
            b = NL.sub(b"\n", WS.sub(b" ", b))
            t = b.decode("utf-8", errors="replace")
            return "\n".join(s.strip() for s in t.split("\n") if s.strip())

        cases = [
            b"", b"<p>a  b\tc</p>", b"a \t b", b"  lead", b"trail   ",
            b"<script>x</script>y<!--z-->w",
            b"<ScRiPt a=b>var x=1</script  >tail",
            b"<style media='x'>p{}</style>ok",
            b"\xc2\xa0  hi \xff<b>q</b>", b"&nbsp;&amp;&lt;&gt;&quot;&#39;",
            b"a\r\nb\f\vc", b"no tags", b"< notatag", b"a\n\n\n\nb",
            b"x<!-- unterminated", b"<script>never closed", b"tab\there",
            b"a \n b", b"<!--<script>nested</script>-->kept",
        ]
        cases += [_make_html(f"https://s{i % 7}.com/p/{i}", i, i * 13,
                             scale=1 + i % 4) for i in range(200)]
        rng = np.random.default_rng(3)
        alphabet = (b"<>/! -\t\r\n\f\vscriptyle&ampnbsq;#39\"'abz\xc2\xa0\xff"
                    b"\xe2\x82\xac")
        for n in (0, 1, 7, 40, 300):
            for _ in range(40):
                frag = bytes(rng.choice(np.frombuffer(alphabet, np.uint8),
                                        size=n))
                cases.append(frag)
        for c in cases:
            assert extract_text(c) == naive(c), c


class TestSchemaEvolution:
    def test_widen_ints_and_floats(self):
        assert sm.widen(pa.int32(), pa.int64()) == pa.int64()
        assert sm.widen(pa.int64(), pa.int32()) == pa.int64()
        assert sm.widen(pa.float32(), pa.float64()) == pa.float64()
        assert sm.widen(pa.int64(), pa.float32()) == pa.float64()

    def test_incompatible_rejected(self):
        with pytest.raises(sm.SchemaEvolutionError):
            sm.widen(pa.string(), pa.int64())

    def test_reconcile_additive_and_order_insensitive(self):
        a = pa.schema([("x", pa.int32()), ("y", pa.string())])
        b = pa.schema([("x", pa.int64()), ("z", pa.float64())])
        ab = sm.reconcile(a, b)
        assert ab.names == ["x", "y", "z"]
        assert ab.field("x").type == pa.int64()
        ba = sm.reconcile(b, a)
        assert set(ba.names) == set(ab.names)
        assert all(ab.field(n).type == ba.field(n).type for n in ab.names)

    def test_conform_adds_null_and_casts(self):
        target = pa.schema([("x", pa.int64()), ("z", pa.string())])
        out = sm.conform(pa.table({"x": pa.array([1, 2], type=pa.int32())}), target)
        assert out.schema == target
        assert out["z"].to_pylist() == [None, None]

    def test_conform_rejects_unknown_columns(self):
        with pytest.raises(sm.SchemaEvolutionError):
            sm.conform(pa.table({"q": [1]}), pa.schema([("x", pa.int64())]))

    def test_schema_json_roundtrip(self):
        s = pa.schema([("u", pa.string()), ("t", pa.timestamp("us")),
                       ("h", pa.binary()), ("n", pa.int64()), ("f", pa.float64())])
        assert sm.schema_from_json(sm.schema_to_json(s)) == s


class TestBinaryViews:
    def test_views_match_to_pylist_incl_nulls_empty_and_slices(self):
        from chomper_ray.functions.extract import binary_views

        vals = [b"<p>a</p>", None, b"", b"\xff\xfe raw", b"x" * 5000]
        arr = pa.array(vals, type=pa.binary())
        got = binary_views(arr)
        assert [None if v is None else bytes(v) for v in got] == vals

        # chunked + a sliced chunk (slice falls back to to_pylist)
        ch = pa.chunked_array([arr, arr.slice(1, 3)])
        got = binary_views(ch)
        assert ([None if v is None else bytes(v) for v in got]
                == vals + vals[1:4])

        # large_binary falls back
        big = pa.array(vals, type=pa.large_binary())
        got = binary_views(big)
        assert [None if v is None else bytes(v) for v in got] == vals

    def test_extract_stage_output_unchanged(self):
        from chomper_ray.pipelines.cdc import ExtractText
        from chomper_ray.sources.events import _make_html

        htmls = [_make_html(f"https://x.com/{i}", i, 7, 2)
                 for i in range(40)] + [None]
        batch = pa.table({"html": pa.array(htmls, type=pa.binary()),
                          "url": pa.array([str(i) for i in range(41)])})
        out = ExtractText()(batch)
        assert out["text"].to_pylist() == [
            extract_text(h) for h in htmls]
