"""L5 dataset readers: KAIST Complex Urban, TUM-format IO."""
