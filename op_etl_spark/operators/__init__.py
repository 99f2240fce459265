"""Engine operators beyond the suite: pipeline metrics, multimodal
column plumbing, dedup/text/similarity building blocks."""
