"""CLI: tfci-compatible verbs over the local model registry."""
