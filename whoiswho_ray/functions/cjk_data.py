"""Romanized CJK-sphere name dictionaries (operator M5's data dependency).

The reference classifies a romanized author name as Chinese by dictionary
membership: a surname list, a given-name-token list, and ban lists of
entries too common in Western names
(``/root/reference/whoiswho/character/name_match/tool/const.py:1-3311``,
consumed by ``tool/is_chinese.py:70-97``). We deliberately do NOT copy
those lists; this module is authored from scratch from public
romanization standards:

* the full standard Hanyu Pinyin syllable inventory (GB/T 16159 — the
  initials×finals legality table, ~410 syllables), written out per
  initial group rather than overgenerated from a cross product;
* Mandarin surnames from the Hundred Family Surnames in pinyin, plus the
  common two-syllable compound surnames;
* Hong Kong Government Cantonese Romanisation forms of common surnames
  and given-name syllables;
* Wade–Giles / Chinese-postal variants still common in diaspora names;
* Korean surnames and given-name syllables (Revised Romanization and
  McCune–Reischauer spellings) and Vietnamese surnames — the reference's
  dictionaries cover the whole CJK name sphere, so ours do too;
* ban lists: entries that are formally valid romanizations but far more
  frequent as Western names/particles (authored from common Western
  given-name/particle inventories, same spirit as the reference's).

The dictionaries are built at import time with the bans already removed,
mirroring the reference's ``chinese_name``/``chinese_token`` dict build
(``const.py:3303-3311``).
"""

from __future__ import annotations

# fmt: off

# --------------------------------------------------------------------------
# Standard Hanyu Pinyin syllable inventory (toneless), by initial.
# --------------------------------------------------------------------------
PINYIN_SYLLABLES: frozenset[str] = frozenset("""
a ai an ang ao e ei en eng er o ou
ba bai ban bang bao bei ben beng bi bian biao bie bin bing bo bu
pa pai pan pang pao pei pen peng pi pian piao pie pin ping po pou pu
ma mai man mang mao me mei men meng mi mian miao mie min ming miu mo mou mu
fa fan fang fei fen feng fo fou fu
da dai dan dang dao de dei den deng di dia dian diao die ding diu
dong dou du duan dui dun duo
ta tai tan tang tao te teng ti tian tiao tie ting tong tou tu tuan tui tun tuo
na nai nan nang nao ne nei nen neng ni nian niang niao nie nin ning niu
nong nou nu nuan nuo nv nve nu: nue
la lai lan lang lao le lei leng li lia lian liang liao lie lin ling liu
long lou lu luan lun luo lv lve lu: lue
ga gai gan gang gao ge gei gen geng gong gou gu gua guai guan guang gui gun guo
ka kai kan kang kao ke ken keng kong kou ku kua kuai kuan kuang kui kun kuo
ha hai han hang hao he hei hen heng hong hou hu hua huai huan huang hui hun huo
ji jia jian jiang jiao jie jin jing jiong jiu ju juan jue jun
qi qia qian qiang qiao qie qin qing qiong qiu qu quan que qun
xi xia xian xiang xiao xie xin xing xiong xiu xu xuan xue xun
zha zhai zhan zhang zhao zhe zhei zhen zheng zhi zhong zhou zhu zhua zhuai
zhuan zhuang zhui zhun zhuo
cha chai chan chang chao che chen cheng chi chong chou chu chua chuai
chuan chuang chui chun chuo
sha shai shan shang shao she shei shen sheng shi shou shu shua shuai
shuan shuang shui shun shuo
ran rang rao re ren reng ri rong rou ru rua ruan rui run ruo
za zai zan zang zao ze zei zen zeng zi zong zou zu zuan zui zun zuo
ca cai can cang cao ce cen ceng ci cong cou cu cuan cui cun cuo
sa sai san sang sao se sen seng si song sou su suan sui sun suo
ya yan yang yao ye yi yin ying yo yong you yu yuan yue yun
wa wai wan wang wei wen weng wo wu
""".split())

# --------------------------------------------------------------------------
# Surnames (romanized). Mandarin pinyin from the Hundred Family Surnames,
# compound surnames, then Cantonese / Wade-Giles / Korean / Vietnamese
# forms. Entries later removed by BAN_NAME are kept here for
# documentation; the built dict drops them.
# --------------------------------------------------------------------------
_SURNAMES_MANDARIN = """
wang li zhang liu chen yang huang zhao wu zhou xu sun ma zhu hu guo he
lin luo gao zheng liang xie song tang han feng deng cao peng zeng xiao
tian dong yuan pan jiang cai yu du ye cheng wei su lu ding ren yao shen
zhong cui tan fan liao shi jin jia xia fu fang zou xiong bai meng qin
qiu hou yin xue yan duan lei long tao mao hao gu gong shao wan qian dai
mo kong xiang chang kang yi qiao lai wen hong xin ke zhuang niu ge xing
an qi wu pang ni shan ou mi qu wang tong guan ji ju sheng dang lan rao
lou wei chai yao mu nie cen sha bian lv lu geng mou duanmu shangguan
ouyang sima situ zhuge xiahou huangfu dongfang gongsun chunyu murong
zhan bao shu qin chi chu yun zuo fu ai ba bi bian biao bing bu chao che
cong dao diao dou e fang fei gan hang heng hua huan huo jian jiao jie
jing kan kou kuang kui lang leng lian ling luan mai man mei miao min
ming nan ning pei pi piao pu qiang qing quan rong ru ruan shang she
shuai shui si sui tai teng tu tuo wen weng xi xuan xun ying zang zhai
zhen zhi zhuo zi zong zu zan que yue you mu na
""".split()

_SURNAMES_CANTONESE = """
au chan chau cheng cheuk cheung ching chiu chow choy choi chu chui fok
fong fung ho hon hui ip kam kwan kwok lam lau law lee leung lo loh luk mak
man mok ng pang poon shum sin siu so sze szeto tam tang tong tsang tse
tso tsui wan wong woo yam yau yeung yim yip yuen
""".split()

_SURNAMES_WADE_GILES = """
chang chao cheng chien chin chou chu fan feng hsiao hsieh hsu hsueh
huang hung jen kao ku kuo liang liao lin liu lo lu mao meng pai pan
peng shen sun sung tai tan tang tao teng tien tsai tsao tseng tu wang
wei wen wu yang yao yeh yen yin yu yuan
""".split()

_SURNAMES_KOREAN = """
ahn an bae baek bak byun cha chae cho choe choi chun chung gang gim go
gu gwon ha han heo hong hwang hyun im jang jeon jeong jin jo joo jun
jung kang kim ko koo kwon lee lim min moon nam noh oh paik pak park
rhee roh ryu seo seong shim shin sim sohn son song suh sung woo yi yim
yoo yoon youn yun
""".split()

_SURNAMES_VIETNAMESE = """
bui cao chau dang dao dinh do doan duong ho hoang huynh lam le luong
luu ly mai ngo nguyen pham phan quach ta thai tran trinh truong vo vu
vuong
""".split()

# --------------------------------------------------------------------------
# Given-name tokens: the pinyin inventory plus alternate-romanization
# syllables common in HK / Korean / Wade-Giles given names.
# --------------------------------------------------------------------------
_TOKENS_CANTONESE = """
cheuk ching chiu chuen chun chung fai fat fok fung hang heung hing hoi
hok kam kei keung kin king kit kok kuen kwai kwan kwok kwong lai lam
lap lau leung lik ling lok lui luk mak man mei ming mok nam ngai ngan
on pak ping pok pui sang sau shek shing shun sik sin sing siu suen sum
sze tai tak tam tat tik tin ting tong tsang tse tsim tsui tuen wah wai
wan wing wong wuen wun yan yat yau yee yeung yim yin yiu yuen yuk yung
""".split()

_TOKENS_KOREAN = """
ae bin byung chan cheol chol chul dae deok dong duk eui eun eun gi gun
gyu hae hee ho hoon hwa hye hyo hyun hyung il in ja jae ji jin jong joo
joon ju jun jung kee ki kwang kyu kyung mi min moo myung nam ok ran
rim sang seok seon seul seung si sik sil soo sook soon suk sun sung
tae wan won woo wook yeon yeong yong yoon young
""".split()

_TOKENS_WADE_GILES = """
chia chiang chiao chieh chien chih ching chiu cho chuan chuang chueh
chun chung erh hsi hsia hsiang hsiao hsieh hsien hsin hsing hsiu hsu
hsuan hsueh hsun jan jen jih ju juan jui jun kai kang kao ken keng ko
kou kuai kuan kuang kuei kun kung kuo pa pai pao pei pen piao pieh
pien ping szu ta tai tan tao te ti tiao tieh tien ting tsa tsai tsan
tsao tse tso tsu tsui tsun tsung tsu tu tuan tui tun tung tzu
""".split()

# --------------------------------------------------------------------------
# Ban lists: valid romanizations that are far more common as Western
# names/particles; removed from the built dictionaries and re-credited
# only when co-occurring with other CJK evidence (the reference's rule).
# --------------------------------------------------------------------------
BAN_NAME: frozenset[str] = frozenset("""
an ban bar ben bo bu dam dan de dean den der di dia do du for gu ian
jan jean jim jo jr juan kim ku lang le long lou luc man na ng ohm per
re rui sa shaw so ti tim to van von you yu
""".split())

BAN_TOKEN: frozenset[str] = BAN_NAME

CJK_SURNAMES: frozenset[str] = frozenset(
    s for s in (_SURNAMES_MANDARIN + _SURNAMES_CANTONESE
                + _SURNAMES_WADE_GILES + _SURNAMES_KOREAN
                + _SURNAMES_VIETNAMESE)
    if s not in BAN_NAME)

CJK_GIVEN_TOKENS: frozenset[str] = frozenset(
    t for t in (list(PINYIN_SYLLABLES) + _TOKENS_CANTONESE + _TOKENS_KOREAN
                + _TOKENS_WADE_GILES)
    if t not in BAN_TOKEN)
# fmt: on
