"""Sources & sinks: .ace dumps, EDN datom logs, id catalogs, report CSVs."""
