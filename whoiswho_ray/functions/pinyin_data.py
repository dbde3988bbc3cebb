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
    # --- extended surnames (Hundred Family Surnames continuation; the
    # conventional personal-name reading is used for polyphonic chars,
    # ambiguous ones are deliberately absent — pinyin_of returns None) ---
    "毕": "bi", "丛": "cong", "窦": "dou", "房": "fang", "费": "fei",
    "甘": "gan", "耿": "geng", "管": "guan", "桂": "gui", "杭": "hang",
    "霍": "huo", "吉": "ji", "纪": "ji", "季": "ji", "简": "jian",
    "焦": "jiao", "靳": "jin", "井": "jing", "匡": "kuang", "蓝": "lan",
    "冷": "leng", "厉": "li", "连": "lian", "练": "lian", "凌": "ling",
    "柳": "liu", "娄": "lou", "栾": "luan", "麻": "ma", "满": "man",
    "米": "mi", "苗": "miao", "闵": "min", "聂": "nie", "宁": "ning",
    "裴": "pei", "皮": "pi", "蒲": "pu", "戚": "qi", "裘": "qiu",
    "曲": "qu", "屈": "qu", "全": "quan", "冉": "ran", "饶": "rao",
    "阮": "ruan", "芮": "rui", "申": "shen", "盛": "sheng", "师": "shi",
    "寿": "shou", "舒": "shu", "帅": "shuai", "司": "si", "谈": "tan",
    "滕": "teng", "童": "tong", "涂": "tu", "危": "wei", "卫": "wei",
    "闻": "wen", "翁": "weng", "邬": "wu", "巫": "wu", "奚": "xi",
    "席": "xi", "项": "xiang", "萧": "xiao", "忻": "xin", "幸": "xing",
    "胥": "xu", "宣": "xuan", "荀": "xun", "晏": "yan", "尤": "you",
    "游": "you", "于": "yu", "虞": "yu", "禹": "yu", "郁": "yu",
    "喻": "yu", "元": "yuan", "岳": "yue", "臧": "zang", "詹": "zhan",
    "湛": "zhan", "章": "zhang", "甄": "zhen", "支": "zhi", "仲": "zhong",
    "祝": "zhu", "卓": "zhuo", "宗": "zong", "祖": "zu", "左": "zuo",
    # --- extended given-name characters ---
    "爱": "ai", "宝": "bao", "北": "bei", "本": "ben", "碧": "bi",
    "彬": "bin", "冰": "bing", "博": "bo", "才": "cai", "灿": "can",
    "昌": "chang", "晨": "chen", "诚": "cheng", "池": "chi", "传": "chuan",
    "聪": "cong", "翠": "cui", "达": "da", "大": "da", "道": "dao",
    "迪": "di", "典": "dian", "定": "ding", "冬": "dong", "端": "duan",
    "朵": "duo", "恩": "en", "尔": "er", "发": "fa", "繁": "fan",
    "芬": "fen", "丰": "feng", "峰": "feng", "奉": "feng", "夫": "fu",
    "富": "fu", "甫": "fu", "钢": "gang", "格": "ge", "根": "gen",
    "耕": "geng", "功": "gong", "恭": "gong", "贵": "gui", "果": "guo",
    "含": "han", "涵": "han", "和": "he", "恒": "heng", "宏": "hong",
    "虹": "hong", "厚": "hou", "虎": "hu", "花": "hua", "怀": "huai",
    "欢": "huan", "焕": "huan", "惠": "hui", "继": "ji", "济": "ji",
    "加": "jia", "坚": "jian", "剑": "jian", "娇": "jiao", "洁": "jie",
    "捷": "jie", "锦": "jin", "进": "jin", "晋": "jin", "京": "jing",
    "景": "jing", "敬": "jing", "九": "jiu", "菊": "ju", "君": "jun",
    "骏": "jun", "开": "kai", "凯": "kai", "科": "ke", "可": "ke",
    "坤": "kun", "昆": "kun", "来": "lai", "岚": "lan", "朗": "lang",
    "蕾": "lei", "力": "li", "理": "li", "礼": "li", "莉": "li",
    "俐": "li", "莲": "lian", "霖": "lin", "灵": "ling", "玲": "ling",
    "露": "lu", "璐": "lu", "路": "lu", "伦": "lun", "洛": "luo",
    "曼": "man", "茂": "mao", "美": "mei", "萌": "meng", "梦": "meng",
    "妙": "miao", "民": "min", "铭": "ming", "默": "mo", "牧": "mu",
    "南": "nan", "楠": "nan", "妮": "ni", "年": "nian", "诺": "nuo",
    "鸥": "ou", "培": "pei", "佩": "pei", "品": "pin", "璞": "pu",
    "奇": "qi", "琪": "qi", "祺": "qi", "启": "qi", "千": "qian",
    "谦": "qian", "倩": "qian", "琴": "qin", "勤": "qin", "青": "qing",
    "清": "qing", "晴": "qing", "秋": "qiu", "泉": "quan", "群": "qun",
    "仁": "ren", "日": "ri", "蓉": "rong", "榕": "rong", "如": "ru",
    "茹": "ru", "睿": "rui", "润": "run", "若": "ruo", "三": "san",
    "森": "sen", "莎": "sha", "山": "shan", "珊": "shan", "善": "shan",
    "尚": "shang", "少": "shao", "深": "shen", "升": "sheng", "胜": "sheng",
    "圣": "sheng", "诗": "shi", "时": "shi", "实": "shi", "首": "shou",
    "书": "shu", "淑": "shu", "树": "shu", "双": "shuang", "水": "shui",
    "顺": "shun", "硕": "shuo", "松": "song", "素": "su", "穗": "sui",
    "泰": "tai", "棠": "tang", "桃": "tao", "添": "tian", "甜": "tian",
    "铁": "tie", "庭": "ting", "彤": "tong", "通": "tong", "旺": "wang",
    "望": "wang", "威": "wei", "薇": "wei", "维": "wei", "炜": "wei",
    "蔚": "wei", "雯": "wen", "五": "wu", "西": "xi", "希": "xi",
    "熙": "xi", "喜": "xi", "霞": "xia", "先": "xian", "贤": "xian",
    "香": "xiang", "祥": "xiang", "翔": "xiang", "孝": "xiao", "心": "xin",
    "馨": "xin", "雄": "xiong", "修": "xiu", "旭": "xu", "绪": "xu",
    "轩": "xuan", "璇": "xuan", "雅": "ya", "亚": "ya", "岩": "yan",
    "妍": "yan", "研": "yan", "阳": "yang", "尧": "yao", "耀": "yao",
    "业": "ye", "烨": "ye", "依": "yi", "仪": "yi", "宜": "yi",
    "义": "yi", "亿": "yi", "毅": "yi", "翼": "yi", "银": "yin",
    "音": "yin", "殷": "yin", "盈": "ying", "颖": "ying", "映": "ying",
    "优": "you", "友": "you", "佑": "you", "渝": "yu", "愉": "yu",
    "瑜": "yu", "育": "yu", "裕": "yu", "园": "yuan", "圆": "yuan",
    "源": "yuan", "远": "yuan", "媛": "yuan", "越": "yue", "跃": "yue",
    "悦": "yue", "芸": "yun", "蕴": "yun", "韵": "yun", "哲": "zhe",
    "珍": "zhen", "真": "zhen", "震": "zhen", "政": "zheng", "芝": "zhi",
    "之": "zhi", "智": "zhi", "致": "zhi", "洲": "zhou", "竹": "zhu",
    "珠": "zhu", "壮": "zhuang", "紫": "zi", "佐": "zuo",
}
# fmt: on
