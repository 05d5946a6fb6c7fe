"""Job plumbing: checkpoints, lineage and metrics manifests."""
