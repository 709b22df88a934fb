"""The crawl loop: frontier, fetch, parse, politeness, engine (SURVEY §3)."""
