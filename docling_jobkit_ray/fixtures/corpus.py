"""Seeded synthetic `pages` corpus generator (FIXTURES.md §1-2).

Emits the authoritative input table from BASELINE.json's input_hint:
    (url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)

Deterministic for a given (seed, n_rows, n_shards).  Size distribution is
log-normal with a heavy tail (skew fodder); ~2% of rows are poisoned
(dead-letter fodder); ~4% are binary layout payloads (slice-fanout fodder),
mirroring the document mix the reference's preflight/slice machinery handles
(``/root/reference/docling_jobkit/convert/materialization.py:158-213``,
``orchestrators/ray/serve_deployment.py:437-464``).
"""

from __future__ import annotations

import datetime as _dt
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ..extract.binarydoc import build_binary_doc

_WORDS = (
    "data stream shard block arrow batch actor parse extract page layout "
    "table heading content density anchor main footer crawl corpus token "
    "pipeline schedule spill memory object store shuffle partition key "
    "document record column vector kernel node cluster worker driver "
    "throughput latency checkpoint manifest resume lineage metric scale"
).split()

_LANGS = ["en", "en", "en", "en", "de", "fr", "es", "it", "pt", "nl"]

_EPOCH = _dt.datetime(2024, 1, 1)


def _sentence(rng: random.Random, n_words: int) -> str:
    ws = [rng.choice(_WORDS) for _ in range(n_words)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def _paragraph(rng: random.Random, n_sentences: int) -> str:
    return " ".join(_sentence(rng, rng.randint(6, 16)) for _ in range(n_sentences))


def _nav_block(rng: random.Random, n_links: int) -> str:
    links = "".join(
        f'<li><a href="/{rng.choice(_WORDS)}">{rng.choice(_WORDS)} {rng.choice(_WORDS)}</a></li>'
        for _ in range(n_links)
    )
    return f"<nav><ul>{links}</ul></nav>"


def _related_links_div(rng: random.Random, n_links: int) -> str:
    # Link-dense div OUTSIDE nav/footer: exercises the link-density rule,
    # not just the structural-boilerplate rule.
    links = " | ".join(
        f'<a href="/{rng.choice(_WORDS)}">{rng.choice(_WORDS)} {rng.choice(_WORDS)}</a>'
        for _ in range(n_links)
    )
    return f"<div>Related: {links}</div>"


def _make_html(rng: random.Random, scale: float) -> str:
    """One synthetic page. `scale` multiplies main-content volume."""
    n_paras = max(2, int(rng.randint(3, 8) * scale))
    parts = [
        "<html><head><title>",
        _sentence(rng, 4),
        "</title><style>body{margin:0}</style>",
        "<script>var x = 1;</script></head><body>",
        f"<header><h1>{rng.choice(_WORDS).capitalize()} site</h1>",
        _nav_block(rng, rng.randint(4, 10)),
        "</header>",
        "<main>",
        f"<h1>{_sentence(rng, rng.randint(3, 7))[:-1]}</h1>",
    ]
    for i in range(n_paras):
        if i and rng.random() < 0.25:
            parts.append(f"<h2>{_sentence(rng, rng.randint(2, 5))[:-1]}</h2>")
        parts.append(f"<p>{_paragraph(rng, rng.randint(2, 6))}</p>")
        if rng.random() < 0.15:
            items = "".join(
                f"<li>{_sentence(rng, rng.randint(4, 9))}</li>"
                for _ in range(rng.randint(3, 6))
            )
            parts.append(f"<ul>{items}</ul>")
        if rng.random() < 0.08:
            rows = "".join(
                "<tr>"
                + "".join(f"<td>{_sentence(rng, rng.randint(2, 5))}</td>" for _ in range(3))
                + "</tr>"
                for _ in range(rng.randint(2, 5))
            )
            parts.append(f"<table>{rows}</table>")
        if rng.random() < 0.2:
            parts.append(_related_links_div(rng, rng.randint(5, 12)))
        if rng.random() < 0.1:
            parts.append(f"<p>{_sentence(rng, rng.randint(1, 3))}</p>")  # short → boilerplate
    parts.append("</main>")
    parts.append(
        f"<aside>{_paragraph(rng, 2)}</aside>"
        if rng.random() < 0.3
        else ""
    )
    parts.append(f"<footer>{_nav_block(rng, rng.randint(3, 8))}<p>© 2024 example</p></footer>")
    parts.append("</body></html>")
    return "".join(parts)


def _visible_text(html_str: str) -> str:
    # crude raw visible text (the `text` column is pre-extraction raw text,
    # NOT the oracle output — FIXTURES.md §1)
    import re

    no_script = re.sub(r"<(script|style)[^>]*>.*?</\1>", " ", html_str, flags=re.S)
    stripped = re.sub(r"<[^>]+>", " ", no_script)
    return " ".join(stripped.split())


def generate_rows(
    n_rows: int,
    seed: int = 42,
    *,
    poison_frac: float = 0.02,
    binary_frac: float = 0.04,
    heavy_tail_frac: float = 0.03,
    max_binary_pages: int = 40,
) -> dict[str, list]:
    rng = random.Random(seed)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    n_sites = max(4, n_rows // 50)
    for i in range(n_rows):
        url = f"https://site{i % n_sites}.example/{rng.choice(_WORDS)}/{i}"
        ts = _EPOCH + _dt.timedelta(seconds=i * 37)
        lang = rng.choice(_LANGS)
        r = rng.random()
        if r < poison_frac:
            kind = rng.randrange(3)
            if kind == 0:
                payload = b""  # empty → source_unavailable
            elif kind == 1:
                payload = b"\xff\xfe\x00\x01" + bytes(rng.getrandbits(8) for _ in range(64))
            else:
                # binary container with corrupt directory → MalformedBinaryError
                good = build_binary_doc([_paragraph(rng, 3)])
                payload = good[: len(good) - rng.randint(1, 8)]
            raw_text = ""
        elif r < poison_frac + binary_frac:
            n_pages = rng.randint(2, max_binary_pages)
            pages = [_paragraph(rng, rng.randint(3, 10)) for _ in range(n_pages)]
            if rng.random() < 0.1 and n_pages > 2:
                # one undecodable page → PARTIAL_SUCCESS
                raw = [p.encode("utf-8") for p in pages]
                raw[rng.randrange(n_pages)] = b"\xff\xfe garbage \x80"
                from ..extract.binarydoc import MAGIC, _HEADER, _LEN  # noqa: PLC0415

                payload = (
                    MAGIC
                    + _HEADER.pack(len(raw))
                    + b"".join(_LEN.pack(len(p)) for p in raw)
                    + b"".join(raw)
                )
            else:
                payload = build_binary_doc(pages)
            raw_text = " ".join(pages)
        else:
            scale = 1.0
            if rng.random() < heavy_tail_frac:
                scale = rng.uniform(10.0, 50.0)  # heavy tail (skew fodder)
            html_str = _make_html(rng, scale)
            payload = html_str.encode("utf-8")
            raw_text = _visible_text(html_str)
        urls.append(url)
        tss.append(ts)
        htmls.append(payload)
        texts.append(raw_text)
        langs.append(lang)
    return {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def rows_to_table(cols: dict[str, list]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
            "html": pa.array(cols["html"], pa.binary()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
        }
    )


def write_corpus(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    n_shards: int = 4,
    row_group_size: int = 512,
    **kwargs,
) -> list[str]:
    """Write the corpus as `n_shards` parquet shards (resumable-input layout:
    one shard = one checkpoint unit, SURVEY.md §7.1 step 8). Deterministic:
    shard i gets seed `seed*1000+i` and `n_rows//n_shards` (+remainder) rows.

    Small row groups matter: Ray's parquet reader can only split a file into
    blocks at row-group granularity, so row_group_size bounds the finest
    read parallelism (`override_num_blocks` can't go below it)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    base = n_rows // n_shards
    for i in range(n_shards):
        n = base + (n_rows - base * n_shards if i == n_shards - 1 else 0)
        cols = generate_rows(n, seed=seed * 1000 + i, **kwargs)
        # make urls globally unique across shards
        cols["url"] = [u.replace("https://", f"https://s{i}-") for u in cols["url"]]
        table = rows_to_table(cols)
        path = os.path.join(out_dir, f"pages-{i:05d}.parquet")
        pq.write_table(table, path, row_group_size=row_group_size)
        paths.append(path)
    return paths
