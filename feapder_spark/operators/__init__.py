"""Dataflow operators of the crawl engine (SURVEY.md §2), Spark-first."""
