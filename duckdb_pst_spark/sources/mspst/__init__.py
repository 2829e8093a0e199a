"""Pure-Python reader for the Microsoft PST (Personal Storage Table)
binary format, per the public [MS-PST] specification — the format the
reference parses through its vendored SDK
(/root/reference/README.md:487). Built from the spec's structure
descriptions only; no reference code involved (the reference's parser is
an empty submodule stub in the snapshot anyway).

Layers (mirroring [MS-PST]'s own structure):
- ``ndb``  — node database: header, NBT/BBT B-trees, blocks, data/subnode trees
- ``crypt`` — NDB_CRYPT_PERMUTE byte-substitution codec
- ``ltp``  — lists/tables/properties: heap-on-node, BTH, property & table contexts
- ``messaging`` — folders/messages/recipients/attachments over LTP
- ``datasource`` — PySpark Python DataSource exposing ``spark.read.format("pst")``
"""
