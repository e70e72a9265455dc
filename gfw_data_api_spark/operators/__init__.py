"""Query-plane operators: guarded execution, spatial filters, lookups."""
