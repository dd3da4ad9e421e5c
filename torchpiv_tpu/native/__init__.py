"""Native (C++) runtime components: GIL-free batched frame ingest."""
