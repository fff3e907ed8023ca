import math

from clip_ebc_tpu.models.clip.prompts import bin_prompts, format_count, num2word


def test_num2word_basics():
    assert num2word(0) == "zero"
    assert num2word(5) == "five"
    assert num2word(13) == "thirteen"
    assert num2word(21) == "twenty-one"
    assert num2word(40) == "forty"
    assert num2word(99) == "ninety-nine"
    assert num2word(100) == "one hundred"
    assert num2word(700) == "seven hundred"
    assert num2word(1000) == "one thousand"
    # out-of-table fallback: numeral string
    assert num2word(101) == "101"
    assert num2word(2048) == "2048"


def test_format_count_scalars():
    assert format_count(0, "word") == "There is no person."
    assert format_count(0, "number") == "There is 0 person."
    assert format_count(1, "word") == "There is one person."
    assert format_count(1, "number") == "There is 1 person."
    assert format_count(5, "word") == "There are five people."
    assert format_count(5, "number") == "There are 5 people."


def test_format_count_open_bin():
    assert format_count((10, math.inf), "word") == "There are more than ten people."
    assert format_count((10, math.inf), "number") == "There are more than 10 people."


def test_format_count_finite_bin():
    assert format_count((2, 4), "word") == "There are between two and four people."
    assert format_count((2, 4), "number") == "There are between 2 and 4 people."


def test_bin_prompts_degenerate_bins():
    bins = [(0.0, 0.0), (1.0, 1.0), (2.0, math.inf)]
    prompts = bin_prompts(bins, "word")
    assert prompts == (
        "There is no person.",
        "There is one person.",
        "There are more than two people.",
    )


def test_tokenize_truncation_keeps_eot():
    from clip_ebc_tpu.models.clip.tokenizer import ByteFallbackTokenizer, tokenize

    tok = ByteFallbackTokenizer()
    long_text = "people " * 100  # >77 byte tokens
    out = tokenize([long_text], context_length=16, tokenizer=tok)
    assert out.shape == (1, 16)
    assert out[0, 0] == tok.sot_token
    assert out[0, -1] == tok.eot_token  # truncated but EOT-terminated
    # EOT still holds the row max so argmax pooling finds it
    assert out[0].argmax() == 15
