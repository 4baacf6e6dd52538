"""Operator tools: episode-stream recording, real-assets preflight."""
