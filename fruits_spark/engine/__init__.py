"""Spark execution layer: session, feature extraction, tier rollups,
gap-fill, skew salting, codecs, lineage checkpoints."""
