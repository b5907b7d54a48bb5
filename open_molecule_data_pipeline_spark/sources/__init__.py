"""Source connectors: SDF, delimited SMILES tables, manifests, HTTP APIs."""
