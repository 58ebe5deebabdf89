"""Crawl-engine operators: URL-seen set, politeness, robots gating,
priority queue, frontier loop (SURVEY.md §2.B E4-E12), plus the
engine-level crawl semantics beyond the reference: redirect-chain
resolution (redirects.py), adaptive recrawl + crawl-over-crawl delta
(recrawl.py), revisit dedup (revisit.py), and crawl-trap detection
(traps.py)."""

