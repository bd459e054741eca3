package graft
/** Dev tool for tuning [[graft.functions.LangId]] seed lists: prints
  * the top-5 language distances for one planted sentence per language
  * and flags misses. `sbt "runMain graft.LangIdDbg"`. */
object LangIdDbg {
  def main(args: Array[String]): Unit = {
    import graft.functions.LangId
    val texts = Seq(
      "ru" -> "Дети играют в парке и погода сегодня очень хорошая но мы должны идти домой",
      "uk" -> "Діти граються в парку і погода сьогодні дуже гарна але ми повинні йти додому",
      "bg" -> "Децата играят в парка и времето днес е много хубаво но трябва да се приберем",
      "sr" -> "Деца се играју у парку а време је данас веома лепо али морамо кући",
      "it" -> "I bambini giocano nel parco e il tempo è molto bello oggi ma dobbiamo tornare a casa perché è tardi",
      "pt" -> "As crianças brincam no parque e o tempo está muito bom hoje mas temos que voltar para casa",
      "es" -> "Los niños juegan en el parque y el tiempo es muy bueno hoy pero tenemos que volver a casa",
      "en" -> "The children are playing in the park and the weather is very nice today but we have to go home now",
      "de" -> "Die Kinder spielen im Park und das Wetter ist heute sehr schön aber wir müssen nach Hause gehen",
      "fr" -> "Les enfants jouent dans le parc et le temps est très beau aujourd'hui mais nous devons rentrer à la maison",
      "nl" -> "De kinderen spelen in het park en het weer is vandaag erg mooi maar we moeten naar huis gaan",
      "pl" -> "Dzieci bawią się w parku a pogoda jest dziś bardzo ładna ale musimy wracać do domu",
      "fi" -> "Lapset leikkivät puistossa ja sää on tänään erittäin kaunis mutta meidän täytyy mennä kotiin",
      "tr" -> "Çocuklar parkta oynuyor ve bugün hava çok güzel ama eve gitmemiz gerekiyor",
      "el" -> "Τα παιδιά παίζουν στο πάρκο και ο καιρός είναι πολύ καλός σήμερα αλλά πρέπει να πάμε σπίτι",
      "he" -> "הילדים משחקים בפארק ומזג האוויר טוב מאוד היום אבל אנחנו צריכים ללכת הביתה",
      "ar" -> "الأطفال يلعبون في الحديقة والطقس جميل جدا اليوم ولكن يجب أن نعود إلى المنزل",
      "hi" -> "बच्चे पार्क में खेल रहे हैं और आज मौसम बहुत अच्छा है लेकिन हमें घर जाना है",
      "th" -> "เด็กเล่นในสวนสาธารณะและอากาศวันนี้ดีมากแต่เราต้องกลับบ้าน",
      "zh" -> "孩子们在公园里玩耍今天天气很好但是我们必须回家了",
      "ja" -> "子供たちは公園で遊んでいます今日は天気がとても良いですが家に帰らなければなりません",
      "ko" -> "아이들이 공원에서 놀고 있습니다 오늘 날씨가 매우 좋지만 우리는 집에 가야 합니다",
      "sv" -> "Barnen leker i parken och vädret är mycket fint idag men vi måste gå hem nu",
      "da" -> "Børnene leger i parken og vejret er meget fint i dag men vi skal hjem nu",
      "vi" -> "Trẻ em chơi trong công viên và thời tiết hôm nay rất đẹp nhưng chúng ta phải về nhà",
      "id" -> "Anak anak bermain di taman dan cuaca hari ini sangat bagus tetapi kita harus pulang",
      "fa" -> "بچه ها در پارک بازی می کنند و هوا امروز بسیار خوب است اما باید به خانه برویم",
      "cs" -> "Děti si hrají v parku a počasí je dnes velmi pěkné ale musíme jít domů",
      "hu" -> "A gyerekek a parkban játszanak és az idő ma nagyon szép de haza kell mennünk",
      "ro" -> "Copiii se joacă în parc și vremea este foarte frumoasă astăzi dar trebuie să mergem acasă")
    var bad = 0
    texts.foreach { case (want, t) =>
      val doc = LangId.rankedGrams(t, LangId.DocTopK)
      val dists = LangId.Profiles.map { case (lang, grams) =>
        val pm = grams.toMap
        val d = doc.map { case (g, r) =>
          pm.get(g).map(p => math.abs(r - p).toLong)
            .getOrElse(LangId.ProfileSize.toLong)
        }.sum
        (lang, d)
      }.sortBy(p => (p._2, p._1))
      val mark = if (dists.head._1 == want) "  " else { bad += 1; "XX" }
      println(f"$mark $want%-4s -> ${dists.take(5).map { case (l, d) => s"$l:$d" }.mkString(" ")}")
    }
    println(s"misses: $bad / ${texts.size}")
  }
}
