from .tokenizer import CTCCharTokenizer, DEFAULT_ENGLISH_CTC_VOCAB
from .audio import load_audio, normalize_input_values, peak_normalize
from .dataset import AsrExample, csv_to_examples, id_to_label, prepare_examples
from .collate import LengthBucketBatcher, Batch, pad_batch
from .splits import CLIENT_SPLITS_ADRESS, CLIENT_SPLITS_ADRESSO, filter_by_speakers

__all__ = [
    "CTCCharTokenizer",
    "DEFAULT_ENGLISH_CTC_VOCAB",
    "load_audio",
    "normalize_input_values",
    "peak_normalize",
    "AsrExample",
    "csv_to_examples",
    "id_to_label",
    "prepare_examples",
    "LengthBucketBatcher",
    "Batch",
    "pad_batch",
    "CLIENT_SPLITS_ADRESS",
    "CLIENT_SPLITS_ADRESSO",
    "filter_by_speakers",
]
