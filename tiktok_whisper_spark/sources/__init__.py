"""Sources & sinks: table catalog seam, checkpoint store, readers, exports."""
