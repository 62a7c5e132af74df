"""Sources: schema translation, schema-enforced NDJSON scans, testdata IO."""
