package graft.quality

/** Embedded, deterministic seed corpora for the langid and perplexity models.
  * Original text written for this project (no external data), a few hundred
  * words per language — enough for character-n-gram statistics, tiny enough
  * to broadcast trivially.
  */
object SeedCorpora {

  val english: String =
    """the quick brown fox jumps over the lazy dog near the quiet river bank
      |a committee of researchers published the annual report on energy markets
      |she walked through the old town and bought fresh bread at the corner shop
      |the engineers reviewed the design and approved the updated schedule
      |students across the country presented their projects during the fair
      |we expect moderate growth in the coming quarter according to analysts
      |the library opens early in the morning and closes late in the evening
      |please send the revised document before the end of the working day
      |the weather service issued a warning about strong winds along the coast
      |he finished reading the novel and returned it to the public library
      |the team deployed the new service and monitored the error rates closely
      |local volunteers organized a cleanup along the river and the park
      |the museum exhibition features early photographs of the growing city
      |a balanced diet with fresh vegetables improves long term health outcomes
      |the orchestra rehearsed the symphony for three weeks before the premiere
      |farmers in the valley reported a strong harvest despite the dry summer
      |the spacecraft sent detailed images of the surface after the landing
      |new regulations will require clearer labels on all imported products
      |the workshop covered practical methods for cleaning large data sets
      |her paper introduces a simpler proof of the classical theorem
      |""".stripMargin

  val german: String =
    """der schnelle braune fuchs springt über den faulen hund am ruhigen fluss
      |ein ausschuss von forschern veröffentlichte den jahresbericht über die märkte
      |sie ging durch die altstadt und kaufte frisches brot im laden an der ecke
      |die ingenieure prüften den entwurf und genehmigten den neuen zeitplan
      |studenten aus dem ganzen land präsentierten ihre projekte auf der messe
      |wir erwarten im kommenden quartal ein moderates wachstum der wirtschaft
      |die bibliothek öffnet früh am morgen und schließt spät am abend
      |bitte senden sie das überarbeitete dokument vor dem ende des arbeitstages
      |der wetterdienst warnte vor starkem wind entlang der küste des landes
      |er las den roman zu ende und brachte ihn in die öffentliche bücherei zurück
      |""".stripMargin

  val french: String =
    """le rapide renard brun saute par dessus le chien paresseux près de la rivière
      |un comité de chercheurs a publié le rapport annuel sur les marchés
      |elle a traversé la vieille ville et acheté du pain frais au coin de la rue
      |les ingénieurs ont examiné le projet et approuvé le nouveau calendrier
      |des étudiants de tout le pays ont présenté leurs travaux pendant la foire
      |nous prévoyons une croissance modérée au cours du prochain trimestre
      |la bibliothèque ouvre tôt le matin et ferme tard le soir chaque jour
      |veuillez envoyer le document révisé avant la fin de la journée de travail
      |le service météo a émis un avertissement de vents forts sur la côte
      |il a terminé le roman et l'a rendu à la bibliothèque municipale
      |""".stripMargin

  val spanish: String =
    """el rápido zorro marrón salta sobre el perro perezoso cerca del río tranquilo
      |un comité de investigadores publicó el informe anual sobre los mercados
      |ella caminó por el casco antiguo y compró pan fresco en la tienda de la esquina
      |los ingenieros revisaron el diseño y aprobaron el nuevo calendario
      |estudiantes de todo el país presentaron sus proyectos durante la feria
      |esperamos un crecimiento moderado en el próximo trimestre del año
      |la biblioteca abre temprano por la mañana y cierra tarde por la noche
      |por favor envíe el documento revisado antes del final de la jornada
      |el servicio meteorológico emitió un aviso de vientos fuertes en la costa
      |terminó de leer la novela y la devolvió a la biblioteca pública
      |""".stripMargin

  val greek: String =
    """η γρήγορη καφέ αλεπού πηδά πάνω από τον τεμπέλη σκύλο κοντά στο ήσυχο ποτάμι
      |μια επιτροπή ερευνητών δημοσίευσε την ετήσια έκθεση για τις αγορές
      |περπάτησε στην παλιά πόλη και αγόρασε φρέσκο ψωμί στο μαγαζί της γωνίας
      |οι μηχανικοί εξέτασαν το σχέδιο και ενέκριναν το νέο χρονοδιάγραμμα
      |φοιτητές από όλη τη χώρα παρουσίασαν τις εργασίες τους στην έκθεση
      |περιμένουμε μέτρια ανάπτυξη το επόμενο τρίμηνο σύμφωνα με τους αναλυτές
      |η βιβλιοθήκη ανοίγει νωρίς το πρωί και κλείνει αργά το βράδυ
      |παρακαλώ στείλτε το αναθεωρημένο έγγραφο πριν από το τέλος της ημέρας
      |η μετεωρολογική υπηρεσία εξέδωσε προειδοποίηση για ισχυρούς ανέμους
      |τελείωσε το μυθιστόρημα και το επέστρεψε στη δημόσια βιβλιοθήκη
      |""".stripMargin

  val russian: String =
    """быстрая коричневая лиса прыгает через ленивую собаку у тихой реки
      |комитет исследователей опубликовал годовой отчет о рынках энергии
      |она прошла через старый город и купила свежий хлеб в угловом магазине
      |инженеры рассмотрели проект и утвердили обновленный график работ
      |студенты со всей страны представили свои проекты на ежегодной ярмарке
      |мы ожидаем умеренный рост в следующем квартале согласно аналитикам
      |библиотека открывается рано утром и закрывается поздно вечером
      |пожалуйста отправьте исправленный документ до конца рабочего дня
      |метеослужба выпустила предупреждение о сильном ветре на побережье
      |он дочитал роман и вернул его в публичную библиотеку города
      |""".stripMargin

  val all: Seq[(String, String)] = Seq(
    "en" -> english,
    "de" -> german,
    "fr" -> french,
    "es" -> spanish,
    "el" -> greek,
    "ru" -> russian
  )
}
