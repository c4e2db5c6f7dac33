"""Reference-shaped example clients for the enrichment seams.

These are deployment EXAMPLES, not engine code: each module shows how a
real HTTP client drops into the engine's network-free seams
(``operators/enrich.py``'s uriCache split / fetch_uris / upsert) with
the transport injected, so tests and offline runs use a fake and a
connected deployment passes a real socket-level callable.
"""
