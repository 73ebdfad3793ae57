"""ChatFormat tests: named-template families vs exact expected strings and
Jinja evaluation — data-driven like the reference's t-ChatFormat.cpp (whose
expected outputs, in turn, come from llama.cpp's public template tests)."""

import pytest

from blama_tpu.runtime.chat import ChatFormat, ChatMsg, ChatParams, detect_template

CHAT = [
    ChatMsg("system", "You are a helpful assistant"),
    ChatMsg("user", "Hello"),
    ChatMsg("assistant", "Hi there"),
    ChatMsg("user", "Who are you"),
    ChatMsg("assistant", "   I am an assistant   "),
    ChatMsg("user", "Another question"),
]

NAMED_CASES = [
    (
        "chatml",
        "<|im_start|>system\nYou are a helpful assistant<|im_end|>\n<|im_start|>user\nHello<|im_end|>\n"
        "<|im_start|>assistant\nHi there<|im_end|>\n<|im_start|>user\nWho are you<|im_end|>\n"
        "<|im_start|>assistant\n   I am an assistant   <|im_end|>\n<|im_start|>user\nAnother question<|im_end|>\n"
        "<|im_start|>assistant\n",
    ),
    (
        "llama2",
        "[INST] You are a helpful assistant\nHello [/INST]Hi there</s>[INST] Who are you [/INST]"
        "   I am an assistant   </s>[INST] Another question [/INST]",
    ),
    (
        "llama2-sys-bos",
        "[INST] <<SYS>>\nYou are a helpful assistant\n<</SYS>>\n\nHello [/INST]Hi there</s>"
        "<s>[INST] Who are you [/INST]   I am an assistant   </s><s>[INST] Another question [/INST]",
    ),
    (
        "llama2-sys-strip",
        "[INST] <<SYS>>\nYou are a helpful assistant\n<</SYS>>\n\nHello [/INST]Hi there</s>"
        "[INST] Who are you [/INST]I am an assistant</s>[INST] Another question [/INST]",
    ),
    (
        "monarch",
        "system\nYou are a helpful assistant</s>\n<s>user\nHello</s>\n<s>assistant\nHi there</s>\n"
        "<s>user\nWho are you</s>\n<s>assistant\n   I am an assistant   </s>\n"
        "<s>user\nAnother question</s>\n<s>assistant\n",
    ),
    (
        "gemma",
        "<start_of_turn>user\nYou are a helpful assistant\n\nHello<end_of_turn>\n"
        "<start_of_turn>model\nHi there<end_of_turn>\n<start_of_turn>user\nWho are you<end_of_turn>\n"
        "<start_of_turn>model\nI am an assistant<end_of_turn>\n"
        "<start_of_turn>user\nAnother question<end_of_turn>\n<start_of_turn>model\n",
    ),
    (
        "orion",
        "Human: You are a helpful assistant\n\nHello\n\nAssistant: </s>Hi there</s>"
        "Human: Who are you\n\nAssistant: </s>   I am an assistant   </s>"
        "Human: Another question\n\nAssistant: </s>",
    ),
    (
        "openchat",
        "You are a helpful assistant<|end_of_turn|>GPT4 Correct User: Hello<|end_of_turn|>"
        "GPT4 Correct Assistant: Hi there<|end_of_turn|>GPT4 Correct User: Who are you<|end_of_turn|>"
        "GPT4 Correct Assistant:    I am an assistant   <|end_of_turn|>"
        "GPT4 Correct User: Another question<|end_of_turn|>GPT4 Correct Assistant:",
    ),
    (
        "deepseek",
        "You are a helpful assistant### Instruction:\nHello\n### Response:\nHi there\n<|EOT|>\n"
        "### Instruction:\nWho are you\n### Response:\n   I am an assistant   \n<|EOT|>\n"
        "### Instruction:\nAnother question\n### Response:\n",
    ),
    (
        "vicuna",
        "You are a helpful assistant\n\nUSER: Hello\nASSISTANT: Hi there</s>\n"
        "USER: Who are you\nASSISTANT:    I am an assistant   </s>\nUSER: Another question\nASSISTANT:",
    ),
    (
        "vicuna-orca",
        "SYSTEM: You are a helpful assistant\nUSER: Hello\nASSISTANT: Hi there</s>\n"
        "USER: Who are you\nASSISTANT:    I am an assistant   </s>\nUSER: Another question\nASSISTANT:",
    ),
    (
        "command-r",
        "<|START_OF_TURN_TOKEN|><|SYSTEM_TOKEN|>You are a helpful assistant<|END_OF_TURN_TOKEN|>"
        "<|START_OF_TURN_TOKEN|><|USER_TOKEN|>Hello<|END_OF_TURN_TOKEN|>"
        "<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>Hi there<|END_OF_TURN_TOKEN|>"
        "<|START_OF_TURN_TOKEN|><|USER_TOKEN|>Who are you<|END_OF_TURN_TOKEN|>"
        "<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>I am an assistant<|END_OF_TURN_TOKEN|>"
        "<|START_OF_TURN_TOKEN|><|USER_TOKEN|>Another question<|END_OF_TURN_TOKEN|>"
        "<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>",
    ),
    (
        "llama3",
        "<|start_header_id|>system<|end_header_id|>\n\nYou are a helpful assistant<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nHello<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\nHi there<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nWho are you<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\nI am an assistant<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nAnother question<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n",
    ),
    (
        "phi3",
        "<|system|>\nYou are a helpful assistant<|end|>\n<|user|>\nHello<|end|>\n"
        "<|assistant|>\nHi there<|end|>\n<|user|>\nWho are you<|end|>\n"
        "<|assistant|>\n   I am an assistant   <|end|>\n<|user|>\nAnother question<|end|>\n<|assistant|>\n",
    ),
    (
        "chatglm3",
        "[gMASK]sop<|system|>\n You are a helpful assistant<|user|>\n Hello<|assistant|>\n Hi there"
        "<|user|>\n Who are you<|assistant|>\n    I am an assistant   <|user|>\n Another question<|assistant|>",
    ),
    (
        "chatglm4",
        "[gMASK]<sop><|system|>\nYou are a helpful assistant<|user|>\nHello<|assistant|>\nHi there"
        "<|user|>\nWho are you<|assistant|>\n   I am an assistant   <|user|>\nAnother question<|assistant|>",
    ),
    (
        "minicpm",
        "You are a helpful assistant<用户>Hello<AI>Hi there<用户>Who are you<AI>I am an assistant"
        "<用户>Another question<AI>",
    ),
    (
        "deepseek2",
        "You are a helpful assistant\n\nUser: Hello\n\nAssistant: Hi there<｜end▁of▁sentence｜>"
        "User: Who are you\n\nAssistant:    I am an assistant   <｜end▁of▁sentence｜>"
        "User: Another question\n\nAssistant:",
    ),
    (
        "granite",
        "<|start_of_role|>system<|end_of_role|>You are a helpful assistant<|end_of_text|>\n"
        "<|start_of_role|>user<|end_of_role|>Hello<|end_of_text|>\n"
        "<|start_of_role|>assistant<|end_of_role|>Hi there<|end_of_text|>\n"
        "<|start_of_role|>user<|end_of_role|>Who are you<|end_of_text|>\n"
        "<|start_of_role|>assistant<|end_of_role|>   I am an assistant   <|end_of_text|>\n"
        "<|start_of_role|>user<|end_of_role|>Another question<|end_of_text|>\n"
        "<|start_of_role|>assistant<|end_of_role|>\n",
    ),
    (
        "mistral-v1",
        " [INST] You are a helpful assistant\n\nHello [/INST] Hi there</s> [INST] Who are you [/INST]"
        "    I am an assistant   </s> [INST] Another question [/INST]",
    ),
    (
        "mistral-v3",
        "[INST] You are a helpful assistant\n\nHello[/INST] Hi there</s>[INST] Who are you[/INST]"
        " I am an assistant</s>[INST] Another question[/INST]",
    ),
    (
        "mistral-v3-tekken",
        "[INST]You are a helpful assistant\n\nHello[/INST]Hi there</s>[INST]Who are you[/INST]"
        "   I am an assistant   </s>[INST]Another question[/INST]",
    ),
    (
        "mistral-v7",
        "[SYSTEM_PROMPT] You are a helpful assistant[/SYSTEM_PROMPT][INST] Hello[/INST] Hi there</s>"
        "[INST] Who are you[/INST]    I am an assistant   </s>[INST] Another question[/INST]",
    ),
    (
        "gigachat",
        "<s>You are a helpful assistant<|message_sep|>user<|role_sep|>Hello<|message_sep|>"
        "available functions<|role_sep|>[]<|message_sep|>assistant<|role_sep|>Hi there<|message_sep|>"
        "user<|role_sep|>Who are you<|message_sep|>available functions<|role_sep|>[]<|message_sep|>"
        "assistant<|role_sep|>   I am an assistant   <|message_sep|>user<|role_sep|>Another question"
        "<|message_sep|>available functions<|role_sep|>[]<|message_sep|>assistant<|role_sep|>",
    ),
    (
        "megrez",
        "<|role_start|>system<|role_end|>You are a helpful assistant<|turn_end|>"
        "<|role_start|>user<|role_end|>Hello<|turn_end|>"
        "<|role_start|>assistant<|role_end|>Hi there<|turn_end|>"
        "<|role_start|>user<|role_end|>Who are you<|turn_end|>"
        "<|role_start|>assistant<|role_end|>   I am an assistant   <|turn_end|>"
        "<|role_start|>user<|role_end|>Another question<|turn_end|>"
        "<|role_start|>assistant<|role_end|>",
    ),
    (
        "phi4",
        "<|im_start|>system<|im_sep|>You are a helpful assistant<|im_end|>"
        "<|im_start|>user<|im_sep|>Hello<|im_end|><|im_start|>assistant<|im_sep|>Hi there<|im_end|>"
        "<|im_start|>user<|im_sep|>Who are you<|im_end|>"
        "<|im_start|>assistant<|im_sep|>   I am an assistant   <|im_end|>"
        "<|im_start|>user<|im_sep|>Another question<|im_end|><|im_start|>assistant<|im_sep|>",
    ),
    (
        # reference t-ChatFormat.cpp:165-171 (glmedge family)
        "glmedge",
        "<|system|>\nYou are a helpful assistant<|user|>\nHello<|assistant|>\nHi there"
        "<|user|>\nWho are you<|assistant|>\n   I am an assistant   "
        "<|user|>\nAnother question<|assistant|>",
    ),
]


@pytest.mark.parametrize("tid,expected", NAMED_CASES, ids=[c[0] for c in NAMED_CASES])
def test_named_templates(tid, expected):
    fmt = ChatFormat(tid)
    assert fmt.format_chat(CHAT, True) == expected


def test_template_detection_from_jinja_strings():
    cases = {
        "{% for message in messages %}{{'<|im_start|>' + message['role'] + '\\n' + "
        "message['content'] + '<|im_end|>' + '\\n'}}{% endfor %}"
        "{% if add_generation_prompt %}{{ '<|im_start|>assistant\\n' }}{% endif %}": "chatml",
        "{{ bos_token }}{% for message in messages %}{% if message['role'] == 'user' %}"
        "{{ '[INST] ' + message['content'] + ' [/INST]' }}{% elif message['role'] == 'assistant' %}"
        "{{ message['content'] + eos_token}}{% endif %}{% endfor %}": "llama2",
        "{% set loop_messages = messages %}{% for message in loop_messages %}"
        "{% set content = '<|start_header_id|>' + message['role'] + '<|end_header_id|>\n\n'+ "
        "message['content'] | trim + '<|eot_id|>' %}{{ content }}{% endfor %}": "llama3",
        "{% for message in messages %}{{'<start_of_turn>' + message['role'] + '\\n'}}{% endfor %}": "gemma",
    }
    for tmpl, tid in cases.items():
        assert detect_template(tmpl) == tid


def test_jinja_chatml():
    tmpl = (
        "{% for message in messages %}{{'<|im_start|>' + message['role'] + '\n' + "
        "message['content'] + '<|im_end|>' + '\n'}}{% endfor %}"
        "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
    )
    fmt = ChatFormat(ChatParams(chat_template=tmpl))
    expected = NAMED_CASES[0][1]
    assert fmt.format_chat(CHAT, True) == expected


def test_jinja_bos_strip():
    tmpl = "{{ bos_token }}{% for m in messages %}[{{ m.role }}]{{ m.content }}{% endfor %}"
    fmt = ChatFormat(ChatParams(chat_template=tmpl, bos_token="<s>", eos_token="</s>"))
    out = fmt.format_chat(CHAT[:2], False)
    assert not out.startswith("<s>")  # deduped (ChatFormat.cpp:174-176)


def test_jinja_raise_exception():
    tmpl = "{{ raise_exception('System role not supported') }}"
    fmt = ChatFormat(ChatParams(chat_template=tmpl))
    with pytest.raises(RuntimeError, match="System role not supported"):
        fmt.format_chat(CHAT, True)


def test_invalid_jinja_template():
    with pytest.raises(RuntimeError, match="Unsupported jinja template"):
        ChatFormat(ChatParams(chat_template="{% bad syntax"))


def test_format_msg_incremental_named():
    """formatMsg = diff of formats (ChatFormat.cpp:47-66)."""
    fmt = ChatFormat("chatml")
    history = CHAT[:2]
    msg = ChatMsg("assistant", "Hi there")
    inc = fmt.format_msg(msg, history, False)
    full = fmt.format_chat(history + [msg], False)
    hist_only = fmt.format_chat(history, False)
    assert hist_only + inc == full


def test_format_msg_empty_history():
    fmt = ChatFormat("chatml")
    msg = ChatMsg("user", "hi")
    assert fmt.format_msg(msg, [], False) == fmt.format_chat([msg], False)


def test_jinja_format_msg_incremental():
    tmpl = (
        "{% for message in messages %}{{'<|im_start|>' + message['role'] + '\n' + "
        "message['content'] + '<|im_end|>' + '\n'}}{% endfor %}"
    )
    fmt = ChatFormat(ChatParams(chat_template=tmpl))
    history = CHAT[:3]
    msg = ChatMsg("user", "Who are you")
    inc = fmt.format_msg(msg, history, False)
    assert inc == "<|im_start|>user\nWho are you<|im_end|>\n"


def test_unsupported_template_raises():
    with pytest.raises(ValueError, match="Unsupported chat template"):
        ChatFormat("complete gibberish with no markers")


# -- generation-prompt on/off goldens (t-ChatFormat.cpp:380-431) --------------

GEN_CHAT = [
    ChatMsg("system", "You are a helpful assistant"),
    ChatMsg("user", "Hello"),
    ChatMsg("assistant", "Hello, how can I help?"),
    ChatMsg("user", "I need help with my homework"),
]


def test_generation_prompt_named_llama3():
    fmt = ChatFormat("llama3")
    without = (
        "<|start_header_id|>system<|end_header_id|>\n\n"
        "You are a helpful assistant<|eot_id|><|start_header_id|>user<|end_header_id|>\n\n"
        "Hello<|eot_id|><|start_header_id|>assistant<|end_header_id|>\n\n"
        "Hello, how can I help?<|eot_id|><|start_header_id|>user<|end_header_id|>\n\n"
        "I need help with my homework<|eot_id|>"
    )
    with_gen = without + "<|start_header_id|>assistant<|end_header_id|>\n\n"
    assert fmt.format_chat(GEN_CHAT, True) == with_gen
    assert fmt.format_chat(GEN_CHAT, False) == without


def test_generation_prompt_custom_jinja():
    tpl = (
        "{% for message in messages %}"
        "{{ '<|' + message['role'] + '|>\\n' + message['content'] + '<|end|>' + '\\n' }}"
        "{% endfor %}"
        "{% if add_generation_prompt %}"
        "{{ '<|' + assistant_role + '|>\\n' }}"
        "{% endif %}"
    )
    fmt = ChatFormat(ChatParams(chat_template=tpl, bos_token="", eos_token="",
                                role_assistant="assistant"))
    without = (
        "<|system|>\nYou are a helpful assistant<|end|>\n"
        "<|user|>\nHello<|end|>\n"
        "<|assistant|>\nHello, how can I help?<|end|>\n"
        "<|user|>\nI need help with my homework<|end|>\n"
    )
    with_gen = without + "<|assistant|>\n"
    assert fmt.format_chat(GEN_CHAT, True) == with_gen
    assert fmt.format_chat(GEN_CHAT, False) == without
