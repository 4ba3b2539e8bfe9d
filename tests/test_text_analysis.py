"""Text-analysis operator tests (token stats, quality, lang-id,
fingerprints, jaccard-vs-query)."""

import pyarrow as pa

from gumbo_pp_ray.stages.text_analysis import (
    Fingerprint, LangId, QualityScore, token_stats, word_jaccard_vs_query,
)


def tbl(*texts):
    return pa.table({"doc_id": list(range(len(texts))),
                     "text": list(texts)})


def test_token_stats():
    out = token_stats(tbl("a b b c", "", "x")).to_pylist()
    assert out[0] == {"doc_id": 0, "n_chars": 7, "n_tokens": 4,
                      "n_uniq_tokens": 3, "uniq_ratio_milli": 750}
    assert out[1]["n_tokens"] == 0 and out[1]["uniq_ratio_milli"] == 0
    assert out[2]["n_tokens"] == 1


def test_quality_score_integer_math():
    out = QualityScore()(tbl("the quick brown fox", "aaa " * 50)).to_pylist()
    r = out[0]
    assert r["n_tokens"] == 4 and r["n_uniq"] == 4
    expected = (400 * 4 // 200) + (300 * 4 // 4) + (300 * r["n_alpha"]
                                                   // r["n_chars"])
    assert r["quality_milli"] == expected
    # repetitive text scores lower uniq component
    assert out[1]["n_uniq"] == 1


def test_lang_id_heuristic():
    li = LangId()
    assert li.predict("the cat is in the house and it was warm") == "en"
    assert li.predict("le chat est dans la maison et il est un") == "fr"
    assert li.predict("el gato es una maravilla y los perros en casa") == "es"
    assert li.predict("der hund und die katze ist nicht da") == "de"
    assert li.predict("这是一个测试") == "zh"
    assert li.predict("") == "und"
    out = li(tbl("the cat is the best of all the cats"))
    assert out.column("lang_pred").to_pylist() == ["en"]


def test_fingerprint_deterministic_and_local():
    fp = Fingerprint(k=4, window=5)
    a = fp.fingerprints("the quick brown fox jumps over the lazy dog")
    b = fp.fingerprints("the quick brown fox jumps over the lazy dog")
    assert a == b and len(a) > 0
    # winnowing is local: a shared substring yields shared fingerprints
    c = fp.fingerprints("XXXX the quick brown fox jumps over the lazy dog")
    assert len(set(a) & set(c)) > 0
    assert fp.fingerprints("") == []
    out = fp(tbl("hello world hello world"))
    assert out.column("n_fingerprints").to_pylist()[0] == \
        len(out.column("fingerprints").to_pylist()[0])


def test_word_jaccard_vs_query():
    q = frozenset("a b c".split())
    out = word_jaccard_vs_query(tbl("a b c", "a x y z", "q"),
                                query_tokens=q).to_pylist()
    assert out[0] == {"doc_id": 0, "n_inter": 3, "n_union": 3,
                      "jaccard_milli": 1000}
    assert out[1] == {"doc_id": 1, "n_inter": 1, "n_union": 6,
                      "jaccard_milli": 166}
    assert out[2]["n_inter"] == 0


def test_hash_sample_deterministic_and_partition_invariant():
    import functools
    from gumbo_pp_ray.stages.text_analysis import hash_sample
    t = pa.table({"doc_id": list(range(1000)),
                  "text": ["x"] * 1000})
    s = functools.partial(hash_sample, rate=0.3)
    full = set(s(t).column("doc_id").to_pylist())
    # same keys regardless of batch boundaries
    parts = set()
    for lo in range(0, 1000, 137):
        parts.update(s(t.slice(lo, 137)).column("doc_id").to_pylist())
    assert parts == full
    assert 0.2 < len(full) / 1000 < 0.4
    # disjoint complement at a different salt is ~independent
    other = set(hash_sample(t, rate=0.3, salt="7")
                .column("doc_id").to_pylist())
    assert other != full


def test_repetition_stats_unit():
    import pyarrow as pa
    from gumbo_pp_ray.stages.text_analysis import repetition_stats

    t = pa.table({"doc_id": [0, 1, 2],
                  "text": ["a b c a b c a b c",   # heavy repetition
                           "all words unique here now",
                           "x y"]})               # too short for grams
    out = repetition_stats(t, n=3)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    # doc 0: 7 gram instances; "a b c" x3, "b c a" x2, "c a b" x2 → all dup
    assert rows[0]["n_grams"] == 7 and rows[0]["n_dup_grams"] == 7
    assert rows[0]["dup_gram_milli"] == 1000
    assert rows[1]["n_dup_grams"] == 0 and rows[1]["dup_gram_milli"] == 0
    assert rows[2]["n_grams"] == 0 and rows[2]["dup_gram_milli"] == 0


def test_top_tokens_by_group_pipeline(ray_session):
    import pyarrow as pa
    import ray.data
    from gumbo_pp_ray.stages.text_analysis import top_tokens_by_group

    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "lang": ["en", "en", "fr", "fr"],
        "text": ["cat cat dog", "dog cat", "chat chien", "chat chat"],
    })
    out = top_tokens_by_group(ray.data.from_arrow(t), group_col="lang",
                              k=2).take_all()
    got = {(r["lang"], r["rank"]): (r["token"], r["n"]) for r in out}
    assert got == {("en", 1): ("cat", 3), ("en", 2): ("dog", 2),
                   ("fr", 1): ("chat", 3), ("fr", 2): ("chien", 1)}


def test_normalize_text_unit():
    import pyarrow as pa
    from gumbo_pp_ray.stages.text_analysis import normalize_text

    # decomposed e + combining acute must normalize to composed é
    decomposed = "Café  LATTE"
    t = pa.table({"doc_id": [0], "text": [decomposed]})
    out = normalize_text(t)
    assert out.column("norm_text").to_pylist() == ["café latte"]
    # NFC composed form, single codepoint
    assert "́" not in out.column("norm_text").to_pylist()[0]
    # hash matches md5 of the normalized form
    import hashlib
    assert out.column("norm_hash").to_pylist()[0] == \
        hashlib.md5("café latte".encode()).hexdigest()


def test_chunk_documents_windows():
    import pyarrow as pa
    import pytest
    from gumbo_pp_ray.stages.text_analysis import chunk_documents

    toks = [f"t{i}" for i in range(300)]
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": [" ".join(toks), "a b", ""]})
    out = chunk_documents(t, chunk_tokens=128, overlap=32)
    d1 = out.filter(pa.compute.equal(out.column("doc_id"), 1)).to_pylist()
    # starts 0, 96, 192, 288 -> lengths 128,128,108,12
    assert [r["chunk_idx"] for r in d1] == [0, 1, 2, 3]
    assert [r["n_tokens"] for r in d1] == [128, 128, 108, 12]
    # consecutive chunks share exactly `overlap` tokens
    a = d1[0]["chunk_text"].split()
    b = d1[1]["chunk_text"].split()
    assert a[-32:] == b[:32]
    # short doc: one chunk; empty doc: none
    assert [r["n_tokens"] for r in out.to_pylist()
            if r["doc_id"] == 2] == [2]
    assert not [r for r in out.to_pylist() if r["doc_id"] == 3]
    with pytest.raises(ValueError):
        chunk_documents(t, chunk_tokens=32, overlap=32)


def test_scrub_pii_rules_and_counts():
    import re

    from gumbo_pp_ray.stages.text_analysis import PII_RULES, scrub_pii

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [
            "mail bob.smith+x@corp.example.org now",
            "host 192.168.0.1 and 10.0.0.255, call +1 555 010 4242",
            "no pii here at all",
            "two mails a@b.io c@d.co and ip 8.8.8.8",
        ],
    })
    out = scrub_pii(t)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["scrubbed"] == "mail <EMAIL> now"
    assert (rows[1]["n_email"], rows[1]["n_ip"], rows[1]["n_phone"],
            rows[1]["n_redactions"]) == (1, 0, 0, 1)
    assert rows[2]["scrubbed"] == "host <IP> and <IP>, call <PHONE>"
    assert rows[2]["n_redactions"] == 3
    assert rows[3]["scrubbed"] == "no pii here at all"
    assert rows[3]["n_redactions"] == 0
    assert rows[4]["scrubbed"] == "two mails <EMAIL> <EMAIL> and ip <IP>"
    # vectorized output equals a sequential Python-re reference
    for r in t.to_pylist():
        s, total = r["text"], 0
        for _, pat, repl in PII_RULES:
            total += len(re.findall(pat, s))
            s = re.sub(pat, repl, s)
        assert rows[r["doc_id"]]["scrubbed"] == s
        assert rows[r["doc_id"]]["n_redactions"] == total


def test_scrub_pii_rule_order_is_sequential():
    from gumbo_pp_ray.stages.text_analysis import scrub_pii

    # an email with an all-alpha domain next to a standalone IP: the
    # email rule must not eat the IP, and the phone rule must not
    # re-match digits inside already-redacted placeholders
    t = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": ["a@b.org 1.2.3.4 +44 20 7946 0958"],
    })
    out = scrub_pii(t).to_pylist()[0]
    assert out["scrubbed"] == "<EMAIL> <IP> <PHONE>"
    assert (out["n_email"], out["n_ip"], out["n_phone"]) == (1, 1, 1)


def test_line_dedup_planted_boilerplate(ray_session):
    """Corpus line dedup: every occurrence of a cross-doc-repeated
    8-token line is removed (including repeats WITHIN a doc), unique
    lines survive in order, all-unique docs are untouched, and a doc
    whose text is empty still appears (anchor rows)."""
    import hashlib

    import ray.data

    from gumbo_pp_ray.stages.text_analysis import line_dedup

    boiler = "copyright footer all rights reserved site map contact"
    uniq = [" ".join(f"d{i}w{j}" for j in range(8)) for i in range(6)]
    texts = [
        f"{uniq[0]} {boiler}",            # boiler at line 1
        f"{boiler} {uniq[1]} {boiler}",   # boiler twice in one doc
        f"{uniq[2]} {uniq[3]}",           # untouched
        "",                               # empty doc -> anchor only
        f"{uniq[4]} {boiler} {uniq[5]}",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    out = {r["doc_id"]: r for r in line_dedup(
        ray.data.from_arrow(t), tokens_per_line=8, max_docs=1,
        num_partitions=4).take_all()}
    assert len(out) == 5
    assert out[0]["out_text"] == uniq[0] and out[0]["n_removed"] == 1
    assert out[1]["out_text"] == uniq[1] and out[1]["n_removed"] == 2
    assert out[2]["out_text"] == f"{uniq[2]}\n{uniq[3]}"
    assert out[2]["n_removed"] == 0
    assert out[3]["out_text"] == "" and out[3]["n_removed"] == 0
    assert out[4]["out_text"] == f"{uniq[4]}\n{uniq[5]}"
    assert out[4]["n_removed"] == 1
    for r in out.values():
        assert r["out_hash"] == hashlib.md5(
            r["out_text"].encode("utf-8")).hexdigest()
