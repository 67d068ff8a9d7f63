"""Stateful crawl components: URL-seen shards + politeness schedulers."""
