"""Seed CJK-character → pinyin table (operator M5's data dependency).

The reference ships 3,310 lines of name dictionaries
(``/root/reference/whoiswho/character/name_match/tool/const.py``) that we
deliberately do NOT copy. This module provides a from-scratch SEED table:
the standard pinyin romanizations (toneless, as used in romanized author
names) of the ~100 most common Chinese surnames plus frequent given-name
characters — all public knowledge (the Hanyu Pinyin standard, GB/T 16159).

Coverage is intentionally small and high-confidence. For full coverage,
load a public Unihan-derived kHanyuPinlu table and install it with
``names.set_pinyin_table({**COMMON_PINYIN, **your_table})``. Characters
outside the installed table are never guessed: ``pinyin_of`` returns None
and the match cascade treats the form as non-matching.

For polyphonic characters the entry is the reading conventional in
personal names (e.g. 曾 → "zeng", 单 → "shan", 解 → "xie").
"""

from __future__ import annotations

# fmt: off
COMMON_PINYIN: dict[str, str] = {
    # --- top ~100 surnames (Hundred Family Surnames frequency order) ---
    "王": "wang", "李": "li", "张": "zhang", "刘": "liu", "陈": "chen",
    "杨": "yang", "黄": "huang", "赵": "zhao", "吴": "wu", "周": "zhou",
    "徐": "xu", "孙": "sun", "马": "ma", "朱": "zhu", "胡": "hu",
    "郭": "guo", "何": "he", "林": "lin", "罗": "luo", "高": "gao",
    "郑": "zheng", "梁": "liang", "谢": "xie", "宋": "song", "唐": "tang",
    "许": "xu", "韩": "han", "冯": "feng", "邓": "deng", "曹": "cao",
    "彭": "peng", "曾": "zeng", "肖": "xiao", "田": "tian", "董": "dong",
    "袁": "yuan", "潘": "pan", "蒋": "jiang", "蔡": "cai", "余": "yu",
    "杜": "du", "叶": "ye", "程": "cheng", "魏": "wei", "苏": "su",
    "吕": "lv", "丁": "ding", "任": "ren", "卢": "lu", "姚": "yao",
    "沈": "shen", "钟": "zhong", "姜": "jiang", "崔": "cui", "谭": "tan",
    "陆": "lu", "范": "fan", "汪": "wang", "廖": "liao", "石": "shi",
    "金": "jin", "韦": "wei", "贾": "jia", "夏": "xia", "傅": "fu",
    "方": "fang", "邹": "zou", "熊": "xiong", "白": "bai", "孟": "meng",
    "秦": "qin", "邱": "qiu", "侯": "hou", "江": "jiang", "尹": "yin",
    "薛": "xue", "闫": "yan", "段": "duan", "雷": "lei", "龙": "long",
    "黎": "li", "史": "shi", "陶": "tao", "贺": "he", "毛": "mao",
    "郝": "hao", "顾": "gu", "龚": "gong", "邵": "shao", "万": "wan",
    "钱": "qian", "严": "yan", "武": "wu", "戴": "dai", "莫": "mo",
    "孔": "kong", "向": "xiang", "常": "chang", "汤": "tang", "康": "kang",
    "易": "yi", "乔": "qiao", "赖": "lai", "文": "wen", "施": "shi",
    "洪": "hong", "辛": "xin", "柯": "ke", "庄": "zhuang", "温": "wen",
    "牛": "niu", "樊": "fan", "葛": "ge", "邢": "xing", "安": "an",
    "齐": "qi", "伍": "wu", "庞": "pang", "颜": "yan", "倪": "ni",
    "解": "xie", "单": "shan", "欧": "ou",
    # --- frequent given-name characters ---
    "伟": "wei", "芳": "fang", "娜": "na", "敏": "min", "静": "jing",
    "丽": "li", "强": "qiang", "磊": "lei", "军": "jun", "洋": "yang",
    "勇": "yong", "艳": "yan", "杰": "jie", "娟": "juan", "涛": "tao",
    "明": "ming", "超": "chao", "平": "ping", "刚": "gang", "辉": "hui",
    "华": "hua", "红": "hong", "玉": "yu", "梅": "mei", "鹏": "peng",
    "斌": "bin", "波": "bo", "宇": "yu", "浩": "hao", "欣": "xin",
    "婷": "ting", "雪": "xue", "琳": "lin", "燕": "yan", "云": "yun",
    "飞": "fei", "晶": "jing", "亮": "liang", "成": "cheng", "东": "dong",
    "国": "guo", "小": "xiao", "春": "chun", "丹": "dan", "萍": "ping",
    "建": "jian", "志": "zhi", "新": "xin", "永": "yong", "俊": "jun",
    "海": "hai", "英": "ying", "佳": "jia", "慧": "hui", "健": "jian",
    "晓": "xiao", "德": "de", "秀": "xiu", "兰": "lan", "凤": "feng",
    "庆": "qing", "福": "fu", "生": "sheng", "荣": "rong", "忠": "zhong",
    "学": "xue", "良": "liang", "振": "zhen", "世": "shi", "正": "zheng",
    "光": "guang", "天": "tian", "家": "jia", "立": "li", "益": "yi",
    "月": "yue", "星": "xing", "泽": "ze", "思": "si", "雨": "yu",
    "子": "zi", "一": "yi", "然": "ran", "瑞": "rui", "嘉": "jia",
}
# fmt: on
