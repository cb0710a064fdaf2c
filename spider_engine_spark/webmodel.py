"""Deterministic synthetic web + interleaved-document model.

Single source of truth for the crawl's "physics": both the distributed
Spark pipeline (via pandas UDFs) and the pure-Python replay simulator
(simulator.py) call these functions, so crawl ordering and the final
URL-seen set can be compared bit-for-bit (north_rule replay-equality).

Everything is derived from blake2b-based 64-bit hashes of strings — no
wall clock, no RNG state, no external data. The link graph is skewed on
purpose: HOT_HOST_PCT of links point at host0 (the politeness scheduler's
hot-domain skew case, SURVEY.md §7.3 risk 5).

Documents are the input_hint payload: (doc_id string, spans
array<struct<kind string, text string, media_ref string, offset int>>),
with per-row span-sequence equality (kind, text, media_ref, order) as the
parity invariant.
"""

from __future__ import annotations

import hashlib

NUM_HOSTS = 50
HOT_HOST_PCT = 30  # % of links pointing at host0
FANOUT = 6  # outlinks per fetched page
PATHS_PER_HOST = 100_000
TICKS_PER_STEP = 8  # simulated politeness time budget per superstep
ROBOTS_DISALLOW_MOD = 13  # path ids % 13 == 0 land under /private/
VOCAB = [
    "crawl", "frontier", "spark", "shard", "index", "token", "fetch",
    "queue", "robot", "delay", "depth", "media", "image", "video", "text",
    "graph", "host", "batch", "merge", "scan",
]


def h64(s: str) -> int:
    """Deterministic 64-bit hash (blake2b truncation)."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
    )


def host_name(hid: int) -> str:
    return f"host{hid}.example.com"


def crawl_delay(host: str) -> int:
    """Politeness: ticks between fetches for this host (robots crawl-delay).
    1..4 ticks -> per-superstep budget TICKS_PER_STEP // delay."""
    return 1 + h64("delay:" + host) % 4


def host_budget(host: str) -> int:
    return max(1, TICKS_PER_STEP // crawl_delay(host))


def host_priority(host: str) -> int:
    """0 (high) .. 2 (low); part of the priority-queue bucket key."""
    return h64("prio:" + host) % 3


def robots_allowed(path: str) -> bool:
    """Global robots rule: /private/ subtrees are disallowed."""
    return not path.startswith("/private/")


def child_links(url: str) -> list[str]:
    """Deterministic outlinks of a fetched page, with canonicalization
    noise (case, :80, trailing slash, fragments) so dedup must normalize."""
    out = []
    for i in range(FANOUT):
        hi = h64(f"link:{url}#{i}")
        hd = 0 if hi % 100 < HOT_HOST_PCT else (hi >> 8) % NUM_HOSTS
        pid = (hi >> 16) % PATHS_PER_HOST
        if pid % ROBOTS_DISALLOW_MOD == 0:
            path = f"/private/{pid}"
        else:
            path = f"/p/{pid}"
        host = host_name(hd)
        noise = hi % 4
        if noise == 0:
            raw = f"http://{host.upper()}{path}"
        elif noise == 1:
            raw = f"http://{host}:80{path}"
        elif noise == 2:
            raw = f"http://{host}{path}#sec{i}"
        else:
            raw = f"http://{host}{path}"
        out.append(raw)
    return out


def canonicalize(url: str) -> str:
    """URL canonicalization: lowercase scheme+host, drop default port,
    strip fragment, collapse empty path to '/'."""
    u = url.strip()
    frag = u.find("#")
    if frag >= 0:
        u = u[:frag]
    if "://" in u:
        scheme, rest = u.split("://", 1)
    else:
        scheme, rest = "http", u
    slash = rest.find("/")
    if slash < 0:
        netloc, path = rest, "/"
    else:
        netloc, path = rest[:slash], rest[slash:]
    netloc = netloc.lower()
    if netloc.endswith(":80"):
        netloc = netloc[:-3]
    return f"{scheme.lower()}://{netloc}{path or '/'}"


def url_host(url: str) -> str:
    rest = url.split("://", 1)[1]
    return rest.split("/", 1)[0]


def url_path(url: str) -> str:
    rest = url.split("://", 1)[1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else "/"


def make_text(key: str, n_words: int) -> str:
    words = [VOCAB[h64(f"w:{key}:{j}") % len(VOCAB)] for j in range(n_words)]
    return " ".join(words)


def make_doc(url: str) -> dict:
    """Fetch simulation: the interleaved text+media document at `url`.

    Spans alternate text and media; media spans carry the outlinks in
    media_ref (kind 'link' or 'image'), text spans carry deterministic
    vocab text. offset is the span's position — the per-row span-sequence
    (kind, text, media_ref, offset) is the parity invariant vs the
    reference indexer round-trip (BASELINE.json input_hint).
    """
    links = child_links(url)
    spans = []
    offset = 0
    for i, link in enumerate(links):
        n_words = 3 + h64(f"len:{url}:{i}") % 6
        spans.append(
            {
                "kind": "text",
                "text": make_text(f"{url}:{i}", n_words),
                "media_ref": "",
                "offset": offset,
            }
        )
        offset += 1
        spans.append(
            {
                "kind": "link" if i % 2 else "image",
                "text": "",
                "media_ref": link,
                "offset": offset,
            }
        )
        offset += 1
    return {"doc_id": canonicalize(url), "spans": spans}


def seed_urls(n_seeds: int) -> list[str]:
    """Deterministic seed list: mostly distinct hosts + the hot host."""
    seeds = []
    for i in range(n_seeds):
        hd = 0 if i % 5 == 0 else (h64(f"seed:{i}") % NUM_HOSTS)
        seeds.append(f"http://{host_name(hd)}/p/{1000 + i}")
    return seeds
