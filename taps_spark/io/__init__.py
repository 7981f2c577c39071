"""IO layer: sources, sinks, and the fixture-table loader."""
