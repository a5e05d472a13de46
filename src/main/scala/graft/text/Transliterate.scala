package graft.text

/** Han (pinyin) and Khmer romanization tables — the dictionary tail of
  * rigour's script handling that the table-driven maps in [[TextNorm]]
  * can't cover (reference `matching/logic_v2/names/analysis.py:34-107`
  * routes these scripts through ICU transliteration).
  *
  * Pinyin genuinely needs a per-character dictionary; this is the
  * pragmatic subset assembled from public pinyin romanization: the
  * ~100 highest-frequency Chinese surnames, common given-name
  * characters, and the phonetic characters used to transliterate
  * foreign names (so 贝拉克·奥巴马 folds to "beilake aobama" and can
  * fuzzy-match "Barack Obama"). Characters outside the table pass
  * through unchanged — an unromanized token can still literal-match
  * its exact counterpart, it just won't cross scripts.
  *
  * Khmer is a true alphabet (abugida), so a table suffices: consonants
  * carry their base sound, dependent/independent vowels their vowel,
  * and the shifters/subscript marker fold away. Vowel signs MUST
  * romanize — they are combining marks, and dropping them (the old
  * behavior: non-letters became spaces) collapsed different names to
  * one consonant skeleton, scoring ហ៊ុន ម៉ាណាត / ហ៊ុន ម៉ាណែត a false
  * literal 1.0.
  */
object Transliterate {

  /** Khmer consonants, independent/dependent vowels, signs. */
  val khmer: Map[Char, String] = Map(
    // consonants U+1780-17A2
    'ក' -> "k", 'ខ' -> "kh", 'គ' -> "k", 'ឃ' -> "kh", 'ង' -> "ng",
    'ច' -> "ch", 'ឆ' -> "chh", 'ជ' -> "ch", 'ឈ' -> "chh", 'ញ' -> "nh",
    'ដ' -> "d", 'ឋ' -> "th", 'ឌ' -> "d", 'ឍ' -> "th", 'ណ' -> "n",
    'ត' -> "t", 'ថ' -> "th", 'ទ' -> "t", 'ធ' -> "th", 'ន' -> "n",
    'ប' -> "b", 'ផ' -> "ph", 'ព' -> "p", 'ភ' -> "ph", 'ម' -> "m",
    'យ' -> "y", 'រ' -> "r", 'ល' -> "l", 'វ' -> "v", 'ឝ' -> "sh",
    'ឞ' -> "s", 'ស' -> "s", 'ហ' -> "h", 'ឡ' -> "l", 'អ' -> "a",
    // independent vowels U+17A5-17B3
    'ឥ' -> "i", 'ឦ' -> "i", 'ឧ' -> "u", 'ឨ' -> "u", 'ឩ' -> "u",
    'ឪ' -> "uv", 'ឫ' -> "r", 'ឬ' -> "r", 'ឭ' -> "l", 'ឮ' -> "l",
    'ឯ' -> "e", 'ឰ' -> "ai", 'ឱ' -> "o", 'ឲ' -> "o", 'ឳ' -> "au",
    // dependent vowels U+17B6-17C5
    'ា' -> "a", 'ិ' -> "i", 'ី' -> "i", 'ឹ' -> "oe", 'ឺ' -> "oe",
    'ុ' -> "u", 'ូ' -> "u", 'ួ' -> "uo", 'ើ' -> "ae", 'ឿ' -> "oea",
    'ៀ' -> "ea", 'េ' -> "e", 'ែ' -> "ae", 'ៃ' -> "ai", 'ោ' -> "o",
    'ៅ' -> "au",
    // signs: nikahit, reahmuk; shifters/subscript/silencer fold away
    'ំ' -> "m", 'ះ' -> "h", 'ៈ' -> "", '៉' -> "", '៊' -> "",
    '់' -> "", '៌' -> "", '៍' -> "", '៎' -> "", '៏' -> "",
    '័' -> "", '៑' -> "", '្' -> "")

  /** O-series (second-register) consonants: their inherent vowel is
    * "o" and several dependent vowels shift quality ("u" not "o").
    */
  private val OSeries: Set[Char] = Set(
    'គ', 'ឃ', 'ង', 'ជ', 'ឈ', 'ញ', 'ឌ', 'ឍ', 'ទ', 'ធ', 'ន',
    'ព', 'ភ', 'ម', 'យ', 'រ', 'ល', 'វ')

  private def isCons(c: Char) = c >= 'ក' && c <= 'អ'
  private def isDepVowel(c: Char) = c >= 'ា' && c <= 'ៅ'

  /** Register-aware dependent vowels (a-series value, o-series value);
    * vowels not listed use the flat [[khmer]] table for both.
    */
  private val depVowelBySeries: Map[Char, (String, String)] = Map(
    'ា' -> ("a", "ea"), 'ុ' -> ("o", "u"), 'ូ' -> ("ou", "u"),
    'ើ' -> ("ae", "eu"), 'េ' -> ("e", "e"))

  /** Romanize a string containing Khmer text the way ICU's Any-Latin
    * rule set does in spirit: consonant register tracked through the
    * ៉/៊ shifters, subscript (coeng) clusters glued, dependent vowels
    * register-shifted, and the inherent vowel inserted between two
    * bare consonants ("ពត" → "pot", not "pt"). Non-Khmer characters
    * pass through untouched.
    */
  def khmerWord(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (isCons(c)) {
        var oSeries = OSeries.contains(c)
        var sound = khmer.getOrElse(c, c.toString)
        var j = i + 1
        while (j < n && (s.charAt(j) == '៉' || s.charAt(j) == '៊')) {
          // ៉ forces first register (and uniquely turns b into p),
          // ៊ forces second
          if (s.charAt(j) == '៉') {
            oSeries = false
            if (c == 'ប') sound = "p"
          } else oSeries = true
          j += 1
        }
        sb.append(sound)
        // coeng clusters: ្ + consonant glue onto the onset
        while (j + 1 < n && s.charAt(j) == '្' && isCons(s.charAt(j + 1))) {
          sb.append(khmer.getOrElse(s.charAt(j + 1), ""))
          j += 2
        }
        if (j < n && isDepVowel(s.charAt(j))) {
          val v = s.charAt(j)
          sb.append(depVowelBySeries.get(v) match {
            case Some((a, o)) => if (oSeries) o else a
            case None => khmer.getOrElse(v, "")
          })
          j += 1
        } else if (j < n && isCons(s.charAt(j))) {
          sb.append(if (oSeries) "o" else "a") // inherent vowel
        } else if (j < n && s.charAt(j) == 'ំ') {
          sb.append(if (oSeries) "um" else "am")
          j += 1
        }
        i = j
      } else {
        sb.append(khmer.get(c).getOrElse(c.toString))
        i += 1
      }
    }
    sb.toString
  }

  private val KhmerBlockStart = 0x1780
  private val KhmerBlockEnd = 0x17FF

  def hasKhmer(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= KhmerBlockStart && c <= KhmerBlockEnd) return true
      i += 1
    }
    false
  }

  /** Han → pinyin for common name characters (simplified +
    * high-frequency traditional variants).
    */
  val han: Map[Char, String] = Map(
    // high-frequency surnames
    '王' -> "wang", '李' -> "li", '张' -> "zhang", '刘' -> "liu",
    '陈' -> "chen", '杨' -> "yang", '黄' -> "huang", '赵' -> "zhao",
    '吴' -> "wu", '周' -> "zhou", '徐' -> "xu", '孙' -> "sun",
    '马' -> "ma", '朱' -> "zhu", '胡' -> "hu", '郭' -> "guo",
    '何' -> "he", '林' -> "lin", '高' -> "gao", '罗' -> "luo",
    '郑' -> "zheng", '梁' -> "liang", '谢' -> "xie", '宋' -> "song",
    '唐' -> "tang", '许' -> "xu", '邓' -> "deng", '冯' -> "feng",
    '韩' -> "han", '曹' -> "cao", '彭' -> "peng", '曾' -> "zeng",
    '肖' -> "xiao", '田' -> "tian", '董' -> "dong", '潘' -> "pan",
    '袁' -> "yuan", '蔡' -> "cai", '蒋' -> "jiang", '余' -> "yu",
    '杜' -> "du", '叶' -> "ye", '程' -> "cheng", '魏' -> "wei",
    '吕' -> "lu", '丁' -> "ding", '沈' -> "shen", '任' -> "ren",
    '姚' -> "yao", '卢' -> "lu", '傅' -> "fu", '钟' -> "zhong",
    '姜' -> "jiang", '崔' -> "cui", '谭' -> "tan", '廖' -> "liao",
    '范' -> "fan", '汪' -> "wang", '陆' -> "lu", '金' -> "jin",
    '石' -> "shi", '戴' -> "dai", '贾' -> "jia", '韦' -> "wei",
    '夏' -> "xia", '邱' -> "qiu", '方' -> "fang", '侯' -> "hou",
    '邹' -> "zou", '熊' -> "xiong", '孟' -> "meng", '秦' -> "qin",
    '白' -> "bai", '江' -> "jiang", '阎' -> "yan", '薛' -> "xue",
    '尹' -> "yin", '段' -> "duan", '雷' -> "lei", '黎' -> "li",
    '史' -> "shi", '龙' -> "long", '陶' -> "tao", '贺' -> "he",
    '顾' -> "gu", '毛' -> "mao", '郝' -> "hao", '龚' -> "gong",
    '邵' -> "shao", '万' -> "wan", '钱' -> "qian", '严' -> "yan",
    '覃' -> "qin", '武' -> "wu", '莫' -> "mo", '孔' -> "kong",
    // common given-name characters
    '习' -> "xi", '近' -> "jin", '平' -> "ping", '泽' -> "ze",
    '民' -> "min", '华' -> "hua", '中' -> "zhong", '小' -> "xiao",
    '明' -> "ming", '志' -> "zhi", '伟' -> "wei", '芳' -> "fang",
    '秀' -> "xiu", '英' -> "ying", '娟' -> "juan", '敏' -> "min",
    '静' -> "jing", '强' -> "qiang", '磊' -> "lei", '军' -> "jun",
    '洋' -> "yang", '勇' -> "yong", '艳' -> "yan", '杰' -> "jie",
    '涛' -> "tao", '春' -> "chun", '花' -> "hua", '飞' -> "fei",
    '红' -> "hong", '玉' -> "yu", '兰' -> "lan", '国' -> "guo",
    '东' -> "dong", '京' -> "jing", '大' -> "da", '山' -> "shan",
    '文' -> "wen", '建' -> "jian", '永' -> "yong", '海' -> "hai",
    // phonetic characters used for foreign-name transliteration
    '贝' -> "bei", '拉' -> "la", '克' -> "ke", '奥' -> "ao",
    '巴' -> "ba", '普' -> "pu", '特' -> "te", '朗' -> "lang",
    '斯' -> "si", '坦' -> "tan", '尔' -> "er", '德' -> "de",
    '安' -> "an", '尼' -> "ni", '亚' -> "ya", '历' -> "li",
    '伊' -> "yi", '丽' -> "li", '莎' -> "sha", '娜' -> "na",
    '迪' -> "di", '米' -> "mi", '卡' -> "ka", '洛' -> "luo",
    '维' -> "wei", '托' -> "tuo", '姆' -> "mu", '布' -> "bu",
    '鲁' -> "lu", '诺' -> "nuo", '瓦' -> "wa", '西' -> "xi",
    '里' -> "li", '菲' -> "fei", '加' -> "jia", '纳' -> "na",
    '比' -> "bi", '哈' -> "ha", '萨' -> "sa", '温' -> "wen",
    '森' -> "sen", '俄' -> "e", '法' -> "fa", '美' -> "mei",
    '列' -> "lie", '夫' -> "fu", '科' -> "ke", '基' -> "ji",
    '奇' -> "qi", '曼' -> "man", '顿' -> "dun", '逊' -> "xun",
    '威' -> "wei", '廉' -> "lian", '约' -> "yue", '翰' -> "han",
    '彼' -> "bi", '得' -> "de", '保' -> "bao", '查' -> "cha",
    '理' -> "li", '乔' -> "qiao", '治' -> "zhi", '亨' -> "heng",
    '利' -> "li", '欧' -> "ou", '阿' -> "a", '耶' -> "ye",
    '塞' -> "sai", '赛' -> "sai", '蒂' -> "di", '格' -> "ge",
    '兹' -> "zi", '茨' -> "ci", '泰' -> "tai", '波' -> "bo",
    '登' -> "deng", '顺' -> "shun", '汉' -> "han", '港' -> "gang",
    '台' -> "tai", '湾' -> "wan", '北' -> "bei", '南' -> "nan",
    '上' -> "shang", '广' -> "guang", '深' -> "shen", '圳' -> "zhen",
    // high-frequency traditional variants
    '張' -> "zhang", '劉' -> "liu", '陳' -> "chen", '楊' -> "yang",
    '黃' -> "huang", '趙' -> "zhao", '吳' -> "wu", '孫' -> "sun",
    '馬' -> "ma", '鄭' -> "zheng", '謝' -> "xie", '鄧' -> "deng",
    '馮' -> "feng", '韓' -> "han", '葉' -> "ye", '呂' -> "lu",
    '盧' -> "lu", '鍾' -> "zhong", '譚' -> "tan", '陸' -> "lu",
    '賈' -> "jia", '韋' -> "wei", '龍' -> "long", '賀' -> "he",
    '顧' -> "gu", '龔' -> "gong", '錢' -> "qian", '嚴' -> "yan",
    '國' -> "guo", '華' -> "hua", '澤' -> "ze", '習' -> "xi",
    '貝' -> "bei", '東' -> "dong", '爾' -> "er", '羅' -> "luo",
    '維' -> "wei", '諾' -> "nuo", '魯' -> "lu", '納' -> "na",
    '薩' -> "sa", '溫' -> "wen", '灣' -> "wan", '廣' -> "guang")

  /** Starter Han name-translation table: well-known FOREIGN names
    * written phonetically in Han map to their Latin originals, the way
    * rigour's name-translation data does — char-wise pinyin gives
    * "beilake aobama" for 贝拉克·奥巴马, unreachable from "Barack
    * Obama" by edit distance, while the word-level translation makes
    * the frozen 0.90 pair a literal match. Native Chinese names keep
    * going through the per-character pinyin table. All entries are
    * public standard transliterations (the forms used by Chinese press
    * agencies / Wikipedia zh labels).
    */
  val hanNames: Seq[(String, String)] = Seq(
    "贝拉克" -> "barack", "奥巴马" -> "obama", "歐巴馬" -> "obama",
    "唐纳德" -> "donald", "特朗普" -> "trump", "川普" -> "trump",
    "拜登" -> "biden", "希拉里" -> "hillary", "克林顿" -> "clinton",
    "布什" -> "bush", "里根" -> "reagan", "尼克松" -> "nixon",
    "肯尼迪" -> "kennedy", "罗斯福" -> "roosevelt",
    "默克尔" -> "merkel", "马克龙" -> "macron",
    "泽连斯基" -> "zelensky", "普京" -> "putin",
    "丘吉尔" -> "churchill", "撒切尔" -> "thatcher",
    "斯大林" -> "stalin", "列宁" -> "lenin", "希特勒" -> "hitler",
    "拿破仑" -> "napoleon", "甘地" -> "gandhi", "曼德拉" -> "mandela",
    "马斯克" -> "musk", "埃隆" -> "elon", "盖茨" -> "gates",
    "乔布斯" -> "jobs", "扎克伯格" -> "zuckerberg",
    "贝索斯" -> "bezos", "巴菲特" -> "buffett", "索罗斯" -> "soros",
    "爱因斯坦" -> "einstein", "牛顿" -> "newton",
    "莎士比亚" -> "shakespeare", "贝多芬" -> "beethoven",
    "莫扎特" -> "mozart")

  /** True when `s` contains a CJK unified ideograph (the gate before
    * the [[hanNames]] word pass).
    */
  def hasHan(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3400 && c <= 0x4DBF))
        return true
      i += 1
    }
    false
  }

  /** Replace known Han name words with their Latin originals, spaced
    * so they separate from adjacent characters.
    */
  def applyHanNames(s: String): String = {
    var out = s
    for ((han, latin) <- hanNames if out.contains(han))
      out = out.replace(han, " " + latin + " ")
    out
  }
}
