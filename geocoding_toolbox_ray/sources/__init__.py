"""Sources: synthetic deterministic reference tables + pages corpus, readers."""
