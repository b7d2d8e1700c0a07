"""Cross-cutting utilities: config, logging, dtypes, exceptions, clocks.

Reference counterpart: src/utils (config_loader, logger.hpp,
datatype_utils.hpp, exceptions.hpp, monotonic_clock, input_generator).
"""
