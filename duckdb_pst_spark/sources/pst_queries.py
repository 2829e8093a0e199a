"""PST-domain queries over the fixture tables (SURVEY.md §2.C).

Filled in by the PST source layer milestone; imported by registry.load_all.
"""
