"""Site adapters: page bytes -> spans + discovered links (SURVEY §2.10)."""
