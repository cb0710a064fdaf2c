"""Pure-Python replay oracle for the distributed crawl.

Single-threaded reference implementation of exactly the semantics
CrawlJob executes distributively (frontier.py docstring). Both sides
share webmodel.py for canonicalization, robots, politeness, priority and
fetch simulation, so per-step fetch sets, the final URL-seen set, and
frontier contents must match bit-for-bit — the stand-in for "matching
the reference's crawl ordering and URL-seen set under the same seed list
and politeness budget" (north_rule).
"""

from __future__ import annotations

from dataclasses import dataclass

from spider_engine_spark import webmodel as wm


@dataclass
class Entry:
    url: str
    host: str
    depth: int
    priority: int
    budget: int
    discovered_step: int


class ReplaySimulator:
    def __init__(self, seeds: list[str], cfg: wm.WebConfig = wm.DEFAULT):
        self.cfg = cfg
        self.frontier: dict[str, Entry] = {}
        self.seen: set[str] = set()
        self.step_no = 0
        self.fetched_by_step: dict[int, list[str]] = {}
        self.docs: dict[str, dict] = {}
        for raw in seeds:
            self._admit(raw, depth=0, step=0)

    def _admit(self, raw_url: str, depth: int, step: int) -> bool:
        url = wm.canonicalize(raw_url)
        if not wm.robots_allowed(wm.url_path(url)):
            return False
        if url in self.seen:
            return False
        host = wm.url_host(url)
        self.seen.add(url)
        self.frontier[url] = Entry(
            url=url,
            host=host,
            depth=depth,
            priority=wm.host_priority(host),
            budget=wm.host_budget(host, self.cfg),
            discovered_step=step,
        )
        return True

    def run_step(self) -> dict:
        step = self.step_no
        by_host: dict[str, list[Entry]] = {}
        for e in self.frontier.values():
            by_host.setdefault(e.host, []).append(e)
        batch: list[Entry] = []
        for host, items in by_host.items():
            items.sort(
                key=lambda e: (e.priority, e.depth, e.discovered_step, e.url)
            )
            batch.extend(items[: wm.host_budget(host, self.cfg)])
        self.fetched_by_step[step] = sorted(e.url for e in batch)

        # fetch + link extraction; same-step dup keeps min depth
        cand_depth: dict[str, int] = {}
        robots_blocked = 0
        for e in batch:
            doc = wm.make_doc(e.url, self.cfg)
            self.docs[e.url] = doc
            for span in doc["spans"]:
                if span["media_ref"]:
                    c = wm.canonicalize(span["media_ref"])
                    if not wm.robots_allowed(wm.url_path(c)):
                        robots_blocked += 1
                        continue
                    d = e.depth + 1
                    if c not in cand_depth or d < cand_depth[c]:
                        cand_depth[c] = d

        for e in batch:
            del self.frontier[e.url]
        admitted = 0
        for url, depth in cand_depth.items():
            if url not in self.seen:
                host = wm.url_host(url)
                self.seen.add(url)
                self.frontier[url] = Entry(
                    url=url,
                    host=host,
                    depth=depth,
                    priority=wm.host_priority(host),
                    budget=wm.host_budget(host, self.cfg),
                    discovered_step=step + 1,
                )
                admitted += 1

        self.step_no += 1
        return {
            "step": step + 1,
            "fetched": len(batch),
            "candidates": len(cand_depth),
            "robots_blocked": robots_blocked,
            "admitted": admitted,
            "frontier_size": len(self.frontier),
        }

    def run(self, n_steps: int) -> list[dict]:
        return [self.run_step() for _ in range(n_steps)]
