from .files import (DOC_SCHEMA, read_documents_csv, read_documents_jsonl,
                    read_documents_text, pack_sequences, segment_sequences)
from .sequences import (SEQ_SCHEMA, documents_as_sequences, markov_model,
                        markov_sequences, read_sequences, synth_adversarial,
                        synth_sequences)

__all__ = ["SEQ_SCHEMA", "DOC_SCHEMA", "read_sequences",
           "documents_as_sequences", "synth_sequences", "synth_adversarial",
           "markov_sequences", "markov_model", "read_documents_text",
           "read_documents_jsonl", "read_documents_csv",
           "segment_sequences", "pack_sequences"]
