"""Command-line tooling (reference: ``utils/src/gen_test_data.rs``)."""
