"""Sources and sinks: synthetic token tables, testdata loaders, writers."""
