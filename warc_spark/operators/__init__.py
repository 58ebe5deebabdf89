"""Crawl-engine operators: URL-seen set, politeness, robots gating,
priority queue, frontier loop (SURVEY.md §2.B E4-E12)."""
