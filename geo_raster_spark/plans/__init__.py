"""Plans: checkpointing, resumable pipelines, lineage/metrics."""
